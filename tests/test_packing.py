import numpy as np

from big_vision_tpu.datasets.sequence_packing import (pack_dataset,
                                                      pack_examples)


def test_pack_no_token_loss():
  exs = [{"t": np.arange(1, n + 1)} for n in [3, 4, 5, 2, 6, 1, 7]]
  rows = list(pack_examples(iter(exs), {"t": 8}))
  total = sum(int((r["t_segmentation"] > 0).sum()) for r in rows)
  assert total == sum(len(e["t"]) for e in exs)
  for r in rows:
    assert r["t"].shape == (8,)
    # Positions restart per segment.
    for seg_id in np.unique(r["t_segmentation"]):
      if seg_id == 0:
        continue
      pos = r["t_position"][r["t_segmentation"] == seg_id]
      np.testing.assert_array_equal(pos, np.arange(len(pos)))


def test_pack_truncates_long():
  rows = list(pack_examples(iter([{"t": np.arange(20)}]), {"t": 8}))
  assert len(rows) == 1
  np.testing.assert_array_equal(rows[0]["t"], np.arange(8))


def test_pack_multikey_lockstep():
  exs = [{"a": np.ones(3), "b": np.ones(2) * 2},
         {"a": np.ones(4), "b": np.ones(1) * 3}]
  rows = list(pack_examples(iter(exs), {"a": 8, "b": 4}))
  assert len(rows) == 1
  r = rows[0]
  # Same number of segments in both keys.
  assert set(np.unique(r["a_segmentation"])) == {0, 1, 2}
  assert set(np.unique(r["b_segmentation"])) == {0, 1, 2}


def test_pack_dataset_entry_point():
  exs = [{"t": np.arange(3)}, {"t": np.arange(2)}]
  rows = list(pack_dataset(iter(exs), 6, keys=["t"]))
  assert rows[0]["t"].shape == (6,)


def test_pipeline_pack_integration():
  import big_vision_tpu.input_pipeline as ip
  import big_vision_tpu.pp.ops_general  # noqa: F401
  import big_vision_tpu.pp.proj.paligemma.ops  # noqa: F401
  data = {"text": [f"w{i} " * (i % 5 + 1) for i in range(32)]}
  cfg = dict(
      data=dict(name="arrays", data=data),
      batch_size=8, prefetch=0, shuffle_buffer_size=1,
      # Variable-length tokenization (no padding): packing fills the rows.
      pp=("tok(model='test(100)', eos='yes', inkey='text', outkey='text')"
          "|keep('text')"),
      pack={"text": 16})
  it, _ = ip.training(cfg, seed=0)
  batch = next(it)
  assert batch["text"].shape == (8, 16)
  assert batch["text_segmentation"].shape == (8, 16)
  # Packed rows contain multiple segments.
  segs = np.asarray(batch["text_segmentation"])
  assert segs.max() >= 2
