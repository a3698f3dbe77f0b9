"""FlexiViT smoke config: tiny model, random seqhw per step."""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=32, total_steps=4, batch_size=16,
                       mode="train")
  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = arg.total_steps
  config.num_classes = 8
  config.init_shapes = [(1, arg.res, arg.res, 3)]

  config.input = dict(
      data=dict(name="synthetic", n=64, num_classes=8, h=40, w=40),
      batch_size=arg.batch_size,
      shuffle_buffer_size=32, num_threads=4, prefetch=1,
      pp=(f"decode|resize({arg.res})|value_range(-1, 1)"
          "|onehot(8, key='label', key_result='labels')"
          "|keep('image', 'labels')"),
  )
  config.log_training_steps = 2
  config.ckpt_steps = None

  # Random patchification per step: 32px image -> 2x2 or 4x4 patches.
  config.flexi = mlc.ConfigDict()
  config.flexi.seqhw = mlc.ConfigDict(dict(v=(2, 4), p=(1, 1)))

  if arg.mode == "train":
    config.model_name = "proj.flexi.vit"
    config.model = dict(width=32, depth=1, mlp_dim=64, num_heads=2,
                        patch_size=(16, 16), posemb_size=(2, 2),
                        head_zeroinit=False)
  else:  # distill
    config.student_name = "proj.flexi.vit"
    config.student = dict(num_classes=8, width=32, depth=1, mlp_dim=64,
                          num_heads=2, patch_size=(16, 16),
                          posemb_size=(2, 2), head_zeroinit=False)
    config.teachers = ["prof"]
    config.prof_name = "vit"
    config.prof = dict(num_classes=8, variant="mu/16",
                       head_zeroinit=False)
    config.distance = "kl"
    config.distance_kw = dict(t=1.0)

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 1e-4
  config.schedule = dict(warmup_steps=2, decay_type="cosine")
  config.evals = {}
  return config
