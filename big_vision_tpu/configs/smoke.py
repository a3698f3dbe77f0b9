"""Smoke config: tiny ViT on synthetic JPEG data; runs anywhere in seconds.

  python -m big_vision_tpu.train --config big_vision_tpu/configs/smoke.py \
      --workdir /tmp/bvt_smoke

Exercises the full stack: synthetic DataSource -> host decode+crop -> device
pp -> sharded ViT fwd/bwd -> optimizer -> checkpoint -> classification eval.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=32, total_steps=20, batch_size=16,
                       mixup=True, attn="auto", seq_mesh=0, log=5,
                       stop=0, ckpt=10)
  config = mlc.ConfigDict()

  config.seed = 0
  config.total_steps = arg.total_steps
  config.num_classes = 10
  config.loss = "softmax_xent"
  config.init_shapes = [(1, arg.res, arg.res, 3)]

  if arg.seq_mesh:  # context parallelism: shard the token axis seq_mesh-way
    config.mesh = [("data", -1), ("seq", arg.seq_mesh)]
    config.sharding_rules = [("act_batch", "data"), ("act_emb", None),
                             ("act_len", "seq")]

  config.input = dict(
      data=dict(name="synthetic", n=256, num_classes=10, h=48, w=56),
      batch_size=arg.batch_size,
      shuffle_buffer_size=64,
      num_threads=4,
      prefetch=1,
      pp=(f"decode_jpeg_and_inception_crop({arg.res})|flip_lr"
          "|value_range(-1, 1)"
          "|onehot(10, key='label', key_result='labels')"
          "|keep('image', 'labels')"),
  )

  config.log_training_steps = arg.log
  config.ckpt_steps = arg.ckpt
  if arg.stop:
    config.stop_after_steps = arg.stop

  config.model_name = "vit"
  if arg.seq_mesh:
    # Explicit dims with a small patch so the token count (res/4)^2 is
    # divisible by the seq axis; ring attention needs T % seq == 0.
    config.model = dict(width=32, depth=2, mlp_dim=128, num_heads=2,
                        patch_size=(4, 4), rep_size=True, pool_type="gap",
                        posemb="sincos2d", attn_impl=arg.attn)
  else:
    config.model = dict(variant="mu/16", rep_size=True, pool_type="gap",
                        posemb="sincos2d", attn_impl=arg.attn)

  config.grad_clip_norm = 1.0
  config.optax_name = "scale_by_adam"
  config.optax = dict(mu_dtype="bfloat16")
  config.lr = 0.001
  config.wd = 0.0001
  config.schedule = dict(warmup_steps=5, decay_type="cosine")
  if arg.mixup:
    config.mixup = dict(p=0.2)

  pp_eval = (f"decode|resize_small({arg.res + 8})|central_crop({arg.res})"
             "|value_range(-1, 1)"
             "|onehot(10, key='label', key_result='labels')"
             "|keep('image', 'labels')")
  config.evals = dict(
      val=dict(type="classification",
               data=dict(name="synthetic", n=48, num_classes=10, h=48, w=56),
               pp_fn=pp_eval, loss_name=config.loss, log_steps=10),
  )
  return config
