"""SigLIP/LiT-style contrastive tuning on COCO captions.

Parity target: reference configs/proj/image_text/siglip_lit_coco.py.
Locked image tower + trainable BERT text tower, sigmoid loss.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc
from big_vision_tpu.configs.proj.image_text import common


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=224, runlocal=False, variant="B",
                       init="", img_head=False, batch_size=512)
  txt_name, txt_init, img_name, img_init = common.inits(arg.variant)
  config = mlc.ConfigDict()
  config.seed = 0

  text_len = 16
  config.input = dict(
      data=dict(name="coco_captions", split="train"),
      batch_size=arg.batch_size if not arg.runlocal else 32,
      shuffle_buffer_size=250_000 if not arg.runlocal else 50,
      pp=(f"decode|resize({arg.res})|flip_lr|value_range(-1, 1)"
          "|flatten|choice(inkey='captions/text', outkey='text')"
          f"|bert_tokenize('vocab.txt', {text_len}, inkey='text')"
          "|keep('image', 'labels')"),
  )
  config.total_steps = 5_000 if not arg.runlocal else 1
  config.pp_modules = ["ops_general", "ops_image", "ops_text",
                       "proj.flaxformer.bert_ops"]
  config.init_shapes = [(1, arg.res, arg.res, 3), (1, text_len)]
  config.init_types = ["float32", "int32"]

  config.log_training_steps = 50
  config.ckpt_steps = 1000
  config.loss_use_global_batch = True

  config.model_name = "proj.image_text.two_towers"
  config.model_load = {}
  if arg.init:
    config.model_init = arg.init
  else:
    config.model_init = {"image": img_init, "text": txt_init}
    config.model_load["txt_load_kw"] = {"dont_load": ["head/.*"]}
    if not arg.img_head:
      config.model_load["img_load_kw"] = {"dont_load": ["head/.*"]}
  config.model = dict(
      image_model="vit",
      text_model="proj.flaxformer.bert",
      image=dict(variant=img_name, pool_type="tok",
                 head_zeroinit=False),
      text=dict(config=txt_name, head_zeroinit=False),
      temperature_init=10.0, bias_init=-2.71,
      out_dim=(0, 768))

  # LiT: freeze the image tower, tune the text tower.
  config.schedule = [
      (".*img/.*", None),
      (".*", dict(warmup_steps=max(int(0.03 * 5000), 100),
                  decay_type="cosine")),
  ]
  config.optax_name = "scale_by_adam"
  config.lr = 0.001
  config.wd = 0.01
  config.grad_clip_norm = 1.0

  config.evals = {}
  config.evals.retrieval_coco = dict(
      type="proj.image_text.retrieval",
      data=dict(name="coco_captions", split="val"),
      log_steps=1000,
      pp_img=f"resize({arg.res})|value_range(-1, 1)",
      pp_txt=f"bert_tokenize('vocab.txt', {text_len}, inkey='text')",
      txt_name=("captions", "text"))
  return config
