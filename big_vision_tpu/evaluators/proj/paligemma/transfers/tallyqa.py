"""TallyQA (counting VQA) evaluator: accuracy overall, by difficulty, by count.

Behavior parity: reference evaluators/proj/paligemma/transfers/tallyqa.py.
Number words normalize to numerals ("one" -> "1") on both sides before
comparison; the test split's `issimple` flag (1 simple / 0 complex /
-1 unannotated) drives the difficulty breakdown.
"""

from __future__ import annotations

import big_vision_tpu.evaluators.common as c
from big_vision_tpu.evaluators.proj.paligemma.transfers import driver

API = "jit"

MAX_COUNT = 15

NUMERALS = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10", "eleven": "11", "twelve": "12",
    "thirteen": "13", "fourteen": "14", "fifteen": "15", "sixteen": "16",
    "seventeen": "17", "eighteen": "18", "nineteen": "19", "twenty": "20",
}

# Retained under the reference's public name.
REPLACEMENTS = NUMERALS


def _canonical(s):
  return NUMERALS.get(s.lower(), s)


class Evaluator(driver.DecodeScorer):
  """Counting accuracy with simple/complex and per-count breakdowns."""

  CPU_KEYS = frozenset({"answer", "issimple"})

  def run(self, train_state):
    buckets = ["all", "simple", "complex"]
    buckets += [f"count_{n}" for n in range(MAX_COUNT + 1)]
    hit_sums = dict.fromkeys(buckets, 0.0)
    hit_nums = dict.fromkeys(buckets, 0)

    def tally(bucket, hit):
      hit_sums[bucket] += hit
      hit_nums[bucket] += 1

    for answer, ex in self.examples(train_state):
      answer = _canonical(answer)
      gt = _canonical(ex.text("answer"))
      hit = float(answer == gt)
      tally("all", hit)
      if "issimple" in ex:
        # issimple is 1/0 on test data, -1 (unannotated) on train.
        flag = ex["issimple"]
        if flag == 1:
          tally("simple", hit)
        elif flag == 0:
          tally("complex", hit)
      if f"count_{gt}" in hit_sums:
        tally(f"count_{gt}", hit)

    hit_sums = c.process_sum(hit_sums)
    hit_nums = c.process_sum(hit_nums)

    if n := hit_nums["all"]:
      yield "acc", hit_sums["all"] / n
      yield "num", n
    for bucket in buckets:
      if bucket != "all" and hit_nums[bucket]:
        yield f"acc/{bucket}", hit_sums[bucket] / hit_nums[bucket]
        yield f"num/{bucket}", hit_nums[bucket]
