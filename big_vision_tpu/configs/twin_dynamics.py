"""Shared config for the full-loop dynamics twin (reference vs this repo).

The SAME file configures both trainers; `side=ref|my` only switches the
data-source name (the reference reads the arrays through its `bv:` custom
DataSource hook, ref datasets/core.py:71-77; this repo through the
in-memory `arrays` source). Everything the dynamics depend on — seed,
model, optimizer, schedule, loss, batch size, step count — is one literal
shared by both sides, so a loss-curve match means the *systems* match,
not just their units.

Deliberately dynamics-deterministic: no shuffle (buffer 1), no mixup,
dropout 0, pp empty (the arrays are pre-preprocessed), so the only rng
that matters is model init — which is bit-identical across the two
implementations for the same seed (asserted by tools/dynamics_twin.py).

Usage: --config .../twin_dynamics.py:side=my,npz=/tmp/twin/data_my.npz,steps=200,batch=64
"""

import ml_collections as mlc


def _parse(arg):
  out = dict(side="my", npz="", steps=200, batch=64,
             width=128, depth=2, lr=1e-3, wd=1e-4)
  for kv in (arg or "").split(","):
    if not kv:
      continue
    k, v = kv.split("=", 1)
    assert k in out, f"unknown twin arg {k!r}"
    out[k] = type(out[k])(v)
  return mlc.ConfigDict(out)


def get_config(arg=None):
  a = _parse(arg)
  c = mlc.ConfigDict()
  c.seed = 0
  c.total_steps = a.steps
  c.num_classes = 10
  c.loss = "sigmoid_xent"

  c.input = dict(
      batch_size=a.batch,
      pp="",
      # shuffle(1) is order-preserving on both pipelines; setting it
      # silences this repo's "unshuffled training stream" warning while
      # keeping the reference's tf.data path a no-op shuffle.
      shuffle_buffer_size=1,
      data=dict(
          name="bv:twin_data" if a.side == "ref" else "arrays",
          npz=a.npz,
      ),
  )

  # pp is empty; only ops_general is loaded (the reference's default list
  # pulls in ops_text -> sentencepiece, absent in this image).
  c.pp_modules = ["ops_general"]

  c.log_training_steps = 1
  c.evals = {}

  c.model_name = "vit"
  c.model = dict(width=a.width, depth=a.depth, mlp_dim=4 * a.width,
                 num_heads=4, patch_size=(4, 4), posemb="learn",
                 pool_type="gap", rep_size=False, dropout=0.0)

  c.optax_name = "scale_by_adam"
  c.grad_clip_norm = 1.0
  c.lr = a.lr
  c.wd = a.wd
  c.schedule = dict(warmup_steps=max(1, min(20, a.steps // 5)),
                    decay_type="cosine")
  return c
