"""Provenance ratchet: token similarity vs the reference may only go DOWN.

Runs tools/simcheck.py's sweep (comments/docstrings stripped, difflib token
ratio vs the same-named reference file) and enforces two things:

1. No file outside the pinned ratchet table may be >= 0.60 similar to its
   reference counterpart — new or newly-edited code must be original.
2. Files in the ratchet table may not EXCEED their pinned similarity
   (+ a small tolerance for tokenizer drift). Lowering a value below 0.60
   means the file graduates: remove its row.

The table documents WHY each remaining file sits above the gate; the goal
is an empty table. configs/ are exempt in simcheck itself (published
hyperparameters).
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import simcheck  # noqa: E402

# file -> (max allowed similarity, why it is still above the 0.60 gate)
RATCHET = {
    # The sharding-rule mini-language semantics ARE the spec being matched
    # (VERDICT r3 classed this as unavoidable-similarity category (b)).
    "sharding.py": (0.75, "rule semantics are the compat surface"),
    # Checkpoint-compatible param trees + the public config call surface
    # pin much of the structure; being worked down, must not regrow.
    "models/proj/paligemma/paligemma.py": (0.77, "ratchet: rewrite pending"),
    "trainers/proj/flexi/common.py": (0.70, "small file; metric saturates"),
    "models/proj/givt/givt.py": (0.66, "ratchet: 0.796->0.639 in r4"),
    "models/ppp/gemma.py": (0.62, "ratchet: shared tensor layout w/ ckpts"),
}

GATE = 0.60


@pytest.mark.slow
def test_similarity_ratchet():
    if not os.path.isdir(simcheck.REF):
        pytest.skip("reference tree not present")
    results = simcheck.sweep()
    current = {r["file"]: r["similarity"] for r in results if not r["exempt"]}
    over, regressed = [], []
    for file, sim in current.items():
        pinned = RATCHET.get(file)
        if pinned is not None:
            if sim > pinned[0]:
                regressed.append((file, sim, pinned[0]))
        elif sim >= GATE:
            over.append((file, sim))
    assert not over, (
        f"files >= {GATE} similarity to the reference and not in the "
        f"ratchet table (rewrite them, do not extend the table): {over}")
    assert not regressed, (
        f"ratcheted files regressed above their pinned similarity: "
        f"{regressed}")
    # Rows whose file now scores below the gate (or vanished) must be
    # removed so the ratchet only ever shrinks.
    done = [f for f in RATCHET if current.get(f, 0.0) < GATE]
    assert not done, f"ratchet rows can graduate (delete them): {done}"
