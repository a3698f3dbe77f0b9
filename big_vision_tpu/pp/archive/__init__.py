"""Compat aliases for the reference's `pp.archive.*` module names.

Reference configs list pp op modules by name (e.g.
config.pp_modules = [..., "archive.randaug"], ref configs/vit_s16_i1k.py:64)
and the trainer imports them for registry side-effects. This repo registers
those ops from pp/autoaugment.py; these aliases make the reference module
names resolve so reference configs run unmodified.
"""
