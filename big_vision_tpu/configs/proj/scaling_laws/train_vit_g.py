"""Train ViT-g/14 on JFT-scale data (scaling-laws recipe).

Parity target: reference configs/proj/scaling_laws/train_vit_g.py
(arXiv:2106.04560). The data source is private in the reference too;
swap in your own large classification dataset.
"""

import ml_collections as mlc


def get_config():
  config = mlc.ConfigDict()
  config.seed = 0

  config.input = dict(
      data=dict(name="<your_large_dataset>", split="train"),
      batch_size=4096 * 4,
      shuffle_buffer_size=250_000,
      pp=("decode_jpeg_and_inception_crop(224)|flip_lr"
          "|value_range(-1, 1)"
          "|onehot(18291)|keep('image', 'labels')"),
  )
  config.num_classes = 18291
  config.total_steps = 1_000_000
  config.init_shapes = [(1, 224, 224, 3)]
  config.init_head_bias = -10.0
  config.loss = "sigmoid_xent"

  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.model_name = "vit"
  config.model = mlc.ConfigDict()
  config.model.variant = "g/14"
  config.model.pool_type = "map"

  config.optax_name = "big_vision.scale_by_adafactor"
  config.grad_clip_norm = 1.0
  config.lr = 8e-4
  config.wd = 0.03 * 8e-4
  config.schedule = dict(decay_type="rsqrt", timescale=10_000,
                         warmup_steps=10_000,
                         cooldown_steps=50_000)

  config.mesh = [("data", -1)]
  config.sharding_strategy = [(".*", 'fsdp(axis="data")')]
  config.evals = {}
  return config
