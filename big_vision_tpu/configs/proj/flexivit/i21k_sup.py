"""Pre-train FlexiViT on ImageNet-21k (supervised).

Parity target: reference configs/proj/flexivit/i21k_sup.py. Needs the
imagenet21k dataset (tfds-gated in this image).

Run with: big_vision_tpu.trainers.proj.flexi.train
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc
from big_vision_tpu.configs.common_fewshot import get_fewshot_lsr


def get_config(arg=None):
  c = bvcc.parse_arg(arg, runlocal=False, res=240)
  c = mlc.ConfigDict(dict(arg=c))
  arg = c.arg

  c.seed = 0
  c.total_epochs = 90
  c.num_classes = 21843
  c.init_head_bias = -10.0
  c.loss = "sigmoid_xent"

  c.input = dict()
  c.input.data = dict(name="imagenet21k", split="full[51200:]")
  c.input.batch_size = 4096 if not arg.runlocal else 8
  c.input.shuffle_buffer_size = 250_000 if not arg.runlocal else 25

  pp_common = (f"|value_range(-1, 1)|onehot({c.num_classes})"
               "|keep('image', 'labels')")
  c.input.pp = (f"decode_jpeg_and_inception_crop({arg.res})|flip_lr"
                "|randaug(2,10)" + pp_common)
  pp_eval = f"decode|resize_small({arg.res * 8 // 7})|central_crop({arg.res})"
  c.pp_modules = ["ops_general", "ops_image", "ops_text", "autoaugment"]
  c.init_shapes = [(1, arg.res, arg.res, 3)]

  c.log_training_steps = 50
  c.ckpt_steps = 1000

  c.model_name = "proj.flexi.vit"
  c.model = dict(variant="B", pool_type="tok", posemb="learn",
                 patch_size=(32, 32), posemb_size=(7, 7),
                 seqhw=None)

  # The flexible parameter: the token grid (res 240 => patch 240/seqhw).
  c.flexi = mlc.ConfigDict()
  c.flexi.seqhw = mlc.ConfigDict(dict(
      v=(5, 6, 8, 10, 12, 15, 20, 24, 30, 40),
      p=(1, 1, 1, 1, 1, 34, 1, 1, 1, 1)))

  c.optax_name = "scale_by_adam"
  c.optax = dict(mu_dtype="bfloat16")
  c.grad_clip_norm = 1.0
  c.lr = 0.001
  c.wd = 0.0001
  c.schedule = dict(warmup_steps=10_000, decay_type="cosine")
  c.mixup = dict(p=0.2, fold_in=None)

  def eval_i21k(split, seqhw):
    return dict(
        type="classification",
        pred=f"predict_seqhw={seqhw}",
        data={**c.input.data.to_dict(), "split": split},
        pp_fn=pp_eval + pp_common,
        loss_name=c.loss, log_steps=5000)

  c.evals = {}
  for s in (5, 10, 15, 30):
    c.evals[f"test_{s:02d}"] = eval_i21k("full[:25_600]", s)
  c.evals.fewshot = get_fewshot_lsr(runlocal=arg.runlocal)
  c.evals.fewshot.pred = "predict_seqhw=15"
  c.evals.fewshot.log_steps = 25_000
  return c
