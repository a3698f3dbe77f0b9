"""Transfer (fine-tune) pre-trained models to small datasets.

Parity target: reference configs/transfer.py (model x dataset x crop grid;
expected results in its docstring, e.g. ViT-AugReg-B/32 -> i1k 83.27%).

  python -m big_vision_tpu.train \
      --config big_vision_tpu/configs/transfer.py:model=vit-i21k-augreg-b/32,dataset=cifar10,crop=resmall_crop \
      --workdir $WD --config.lr=0.03
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def _set_model(config, model):
  config.model_load = dict(dont_load=["head/kernel", "head/bias"])
  if model == "vit-i21k-augreg-b/32":
    config.model_name = "vit"
    config.model_init = "howto-i21k-B/32"
    config.model = dict(variant="B/32", pool_type="tok")
  elif model == "vit-i21k-augreg-l/16":
    config.model_name = "vit"
    config.model_init = "howto-i21k-L/16"
    config.model = dict(variant="L/16", pool_type="tok")
  elif model == "vit-s16":
    config.model_name = "vit"
    config.model_init = "i1k-s16-300ep"
    config.model = dict(variant="S/16", pool_type="gap", posemb="sincos2d",
                        rep_size=True)
  elif model == "bit-m-r50x1":
    config.model_name = "bit_paper"
    config.model_init = "M"
    config.model = dict(depth=50, width=1)
  else:
    raise ValueError(f"Unknown model {model!r}")


def _set_task(config, dataset, train, val, test, n_cls, steps=20_000,
              warmup=500, lbl="label", crop="resmall_crop", flip=True,
              h_res=448, l_res=384):
  config.total_steps = steps
  config.schedule = dict(warmup_steps=warmup, decay_type="cosine")
  config.init_shapes = [(1, l_res, l_res, 3)]
  config.input.data = dict(name=dataset, split=train)
  pp_common = ("|value_range(-1, 1)|"
               f"onehot({n_cls}, key='{lbl}', key_result='labels')|"
               "keep('image', 'labels')")
  if crop == "inception_crop":
    pp_train = f"decode|inception_crop({l_res})"
  elif crop == "resmall_crop":
    pp_train = f"decode|resize_small({h_res})|random_crop({l_res})"
  elif crop == "resize_crop":
    pp_train = f"decode|resize({h_res})|random_crop({l_res})"
  else:
    raise ValueError(f"Unknown crop {crop!r}")
  if flip:
    pp_train += "|flip_lr"
  config.input.pp = pp_train + pp_common
  pp = f"decode|resize_small({h_res})|central_crop({l_res})" + pp_common
  config.num_classes = n_cls

  def get_eval(split):
    return dict(type="classification",
                data=dict(name=dataset, split=split),
                loss_name="softmax_xent", log_steps=100, pp_fn=pp)
  config.evals = dict(val=get_eval(val), test=get_eval(test))


def _set_dataset(config, dataset, crop, h_res=448, l_res=384):
  kw = dict(crop=crop, h_res=h_res, l_res=l_res)
  if dataset == "cifar10":
    _set_task(config, "cifar10", "train[:98%]", "train[98%:]", "test", 10,
              steps=10_000, warmup=500, **kw)
  elif dataset == "cifar100":
    _set_task(config, "cifar100", "train[:98%]", "train[98%:]", "test", 100,
              steps=10_000, warmup=500, **kw)
  elif dataset == "imagenet2012":
    _set_task(config, "imagenet2012", "train[:99%]", "train[99%:]",
              "validation", 1000, steps=20_000, warmup=500, **kw)
  elif dataset == "oxford_iiit_pet":
    _set_task(config, "oxford_iiit_pet", "train[:90%]", "train[90%:]",
              "test", 37, steps=500, warmup=100, **kw)
  elif dataset == "oxford_flowers102":
    _set_task(config, "oxford_flowers102", "train[:90%]", "train[90%:]",
              "test", 102, steps=500, warmup=100, **kw)
  else:
    raise ValueError(f"Unknown dataset {dataset!r}")


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, model="vit-i21k-augreg-b/32", dataset="cifar10",
                       crop="resmall_crop", h_res=448, l_res=384,
                       fsdp=False, runlocal=False)
  config = mlc.ConfigDict()
  config.seed = 0
  config.input = dict(batch_size=512 if not arg.runlocal else 16,
                      shuffle_buffer_size=50_000 if not arg.runlocal else 64)
  config.log_training_steps = 10
  config.ckpt_steps = 1000

  config.loss = "softmax_xent"
  config.optax_name = "big_vision.momentum_hp"
  config.grad_clip_norm = 1.0
  config.lr = 0.01
  config.wd = None

  _set_dataset(config, arg.dataset, arg.crop, arg.h_res, arg.l_res)
  _set_model(config, arg.model)

  if arg.fsdp:
    config.sharding_strategy = [(".*", "fsdp(axis='data')")]
  return config
