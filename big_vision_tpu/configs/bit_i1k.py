"""BiT-ResNet50x1 on ImageNet-1k from scratch.

Parity target: reference configs/bit_i1k.py (~32 min on a v3-128; the "BiT
recipe": GN+WS ResNet, momentum SGD with the linear scaling rule).
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, runlocal=False)
  config = mlc.ConfigDict()

  config.seed = 0
  config.total_epochs = 90
  config.num_classes = 1000
  config.loss = "softmax_xent"
  config.init_shapes = [(1, 224, 224, 3)]

  config.input = dict(
      data=dict(name="imagenet2012", split="train[:99%]"),
      batch_size=4096 if not arg.runlocal else 32,
      shuffle_buffer_size=250_000 if not arg.runlocal else 100,
  )
  pp_common = ("|onehot(1000, key='{lbl}', key_result='labels')"
               "|value_range(-1, 1)|keep('image', 'labels')")
  config.input.pp = ("decode_jpeg_and_inception_crop(224)|flip_lr"
                     + pp_common.format(lbl="label"))
  pp_eval = "decode|resize_small(256)|central_crop(224)" + pp_common

  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.model_name = "bit"
  config.model = dict(depth=50, width=1.0)

  config.optax_name = "big_vision.momentum_hp"
  config.grad_clip_norm = 1.0
  # Linear scaling rule for both lr and wd.
  config.wd = (1e-4 / 256) * config.input.batch_size
  config.lr = (0.1 / 256) * config.input.batch_size
  config.schedule = dict(decay_type="cosine", warmup_steps=1000)

  def get_eval(split, dataset="imagenet2012", lbl="label"):
    return dict(type="classification",
                data=dict(name=dataset, split=split),
                pp_fn=pp_eval.format(lbl=lbl), loss_name=config.loss,
                log_steps=1000, cache="final_data")
  config.evals = dict(
      train=get_eval("train[:2%]"),
      minival=get_eval("train[99%:]"),
      val=get_eval("validation"),
      v2=get_eval("test", dataset="imagenet_v2"),
      real=get_eval("validation", dataset="imagenet2012_real",
                    lbl="real_label"),
  )
  if arg.runlocal:
    config.evals = dict(val=config.evals.val)
    config.evals.val.cache = "none"
  return config
