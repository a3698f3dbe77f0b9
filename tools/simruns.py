#!/usr/bin/env python
"""Show the longest matching token runs between a repo file and its reference.

Companion to simcheck.py: points the rewrite effort at the exact code runs
that dominate the similarity score.

    python tools/simruns.py models/mlp_mixer.py [--min 20] [--top 15]
"""
import argparse
import difflib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import simcheck


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--min", type=int, default=15)
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    mine = os.path.join(simcheck.REPO, args.file)
    ref = simcheck.find_ref_counterpart(args.file)
    assert ref, f"no reference counterpart for {args.file}"
    a = simcheck.strip_and_tokenize(mine)
    b = simcheck.strip_and_tokenize(ref)
    sm = difflib.SequenceMatcher(None, a, b, autojunk=False)
    blocks = [m for m in sm.get_matching_blocks() if m.size >= args.min]
    blocks.sort(key=lambda m: -m.size)
    total_match = sum(m.size for m in sm.get_matching_blocks())
    print(f"ratio={sm.ratio():.3f}  tokens: mine={len(a)} ref={len(b)} "
          f"matched={total_match}")
    print(f"runs >= {args.min} tokens: {len(blocks)} "
          f"(covering {sum(m.size for m in blocks)} tokens)\n")
    for m in blocks[:args.top]:
        snippet = " ".join(a[m.a:m.a + min(m.size, 30)])
        print(f"[{m.size:4d} toks] mine@{m.a} ref@{m.b}: {snippet}"
              + (" ..." if m.size > 30 else ""))


if __name__ == "__main__":
    main()
