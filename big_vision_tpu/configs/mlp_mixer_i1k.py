"""MLP-Mixer-B/16 on ImageNet-1k.

Parity target: reference configs/mlp_mixer_i1k.py (76.3% in 300ep on a
v3-128; 70.5% in 60ep — see BASELINE.md).

  python -m big_vision_tpu.train \
      --config big_vision_tpu/configs/mlp_mixer_i1k.py --workdir $WD
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, variant="B/16", runlocal=False)
  config = mlc.ConfigDict()

  config.seed = 0
  config.total_epochs = 300
  config.num_classes = 1000
  config.loss = "sigmoid_xent"
  config.init_head_bias = -6.9
  config.init_shapes = [(1, 224, 224, 3)]

  config.input = dict(
      data=dict(name="imagenet2012", split="train[:99%]"),
      batch_size=4096 if not arg.runlocal else 32,
      shuffle_buffer_size=250_000 if not arg.runlocal else 64,
      prefetch=2,
  )
  config.input.pp = (
      "decode_jpeg_and_inception_crop(224)|flip_lr|randaug(2,15)"
      "|value_range(-1, 1)"
      "|onehot(1000, key='label', key_result='labels')"
      "|keep('image', 'labels')")
  pp_eval = ("decode|resize_small(256)|central_crop(224)|value_range(-1, 1)"
             "|onehot(1000, key='{lbl}', key_result='labels')"
             "|keep('image', 'labels')")

  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.model_name = "mlp_mixer"
  config.model = dict(variant=arg.variant, stoch_depth=0.1)

  config.mixup = dict(p=0.5)

  config.grad_clip_norm = 1.0
  config.optax_name = "scale_by_adam"
  config.lr = 0.001
  config.wd = 1e-4
  config.schedule = dict(decay_type="linear", warmup_steps=10_000,
                         linear_end=1e-5)

  def get_eval(split, dataset="imagenet2012", lbl="label"):
    return dict(type="classification",
                data=dict(name=dataset, split=split),
                pp_fn=pp_eval.format(lbl=lbl),
                loss_name=config.loss, log_steps=2500)
  config.evals = dict(
      train=get_eval("train[:2%]"),
      minival=get_eval("train[99%:]"),
      val=get_eval("validation"),
      v2=get_eval("test", dataset="imagenet_v2"),
  )
  return config
