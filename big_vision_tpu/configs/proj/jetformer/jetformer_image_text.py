"""JetFormer joint image+text generation on paired image-text data.

Parity target: reference
configs/proj/jetformer/jetformer_image_text.py. The reference trains
on a private corpus; this config defaults to coco_captions.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc

MODELS = {
    "350M": dict(width=1024, depth=24, mlp_dim=4096, num_heads=16,
                 num_kv_heads=1, head_dim=64),
    "750M": dict(width=1280, depth=36, mlp_dim=5120, num_heads=16,
                 num_kv_heads=1, head_dim=80),
}


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=256, patch_size=16, model_size="350M",
                       text_len=64, runlocal=False)
  c = mlc.ConfigDict()
  c.seed = 0
  c.total_epochs = 20

  tokenizer = ("tokenize(max_len={}, model='c4_en', eos='sticky',"
               " pad_value=0, inkey='text')".format(arg.text_len))
  c.input = dict(
      data=dict(name="coco_captions", split="train"),
      batch_size=1024 if not arg.runlocal else 8,
      shuffle_buffer_size=25_000 if not arg.runlocal else 10,
      pp=(f"decode|resize_small({arg.res}, method='bicubic',"
          " antialias=True)"
          f"|central_crop({arg.res})|flip_lr"
          "|value_range(-1, 1, key='image')"
          "|flatten|choice(inkey='captions/text', outkey='text')"
          f"|{tokenizer}"
          "|copy('labels', 'text')"
          "|setdefault('text_loss', [1])"
          "|copy('text_loss', 'text_mask')"
          "|keep('image', 'text', 'text_mask', 'text_loss')"),
  )
  c.init_shapes = [(1, arg.res, arg.res, 3), (1, arg.text_len)]
  c.log_training_steps = 50
  c.ckpt_steps = 1000

  seq_len = (arg.res // arg.patch_size) ** 2
  subpix = arg.patch_size ** 2 * 3
  c.decode_len = seq_len
  c.sample_images = dict(cfg_inference_weight=3.0, temperature=0.94,
                         temperature_probs=1.0)

  c.patch_pca = mlc.ConfigDict()
  c.patch_pca.model_name = "proj.jetformer.patch_pca"
  c.patch_pca.model = mlc.ConfigDict(dict(
      depth_to_seq=1, input_size=(arg.res, arg.res),
      patch_size=(arg.patch_size, arg.patch_size),
      code_len=seq_len, codeword_dim=subpix,
      noise_std=0.0, add_dequant_noise=True, skip_pca=True))

  c.model_name = "proj.jetformer.jetformer"
  c.model = mlc.ConfigDict(MODELS[arg.model_size])
  c.model.vocab_size = 32_000 + 3
  c.model.bos_id = 32_000
  c.model.boi_id = 32_001
  c.model.nolabel_id = 32_002
  c.model.out_dim = 128
  c.model.num_mixtures = 1024
  c.model.dropout = 0.1
  c.model.drop_labels_probability = 0.1
  c.model.scan = True
  c.model.remat_policy = "nothing_saveable"

  c.input_noise_std = 0.3
  c.noise_scale = 64.0
  c.latent_noise_dim = subpix - c.model.out_dim
  c.text_prefix_prob = 0.5  # Both orders: text->image, image->text.
  c.loss_on_prefix = True

  c.adaptor_name = "proj.jet.jet"
  c.adaptor = mlc.ConfigDict()
  c.adaptor.model = dict(
      depth=32, block_depth=4, emb_dim=512, num_heads=8, ps=1,
      kinds=("channels",),
      channels_coupling_projs=("random",),
      spatial_coupling_projs=("checkerboard", "checkerboard-inv"))

  c.optax_name = "scale_by_adam"
  c.optax = dict(b2=0.95)
  c.grad_clip_norm = 1.0
  c.ema_decay = 0.0
  c.lr = 0.001
  c.wd = 0.0001
  c.schedule = [
      (".*FREEZE_ME.*", None),
      (".*", dict(decay_type="cosine", warmup_percent=0.1)),
  ]
  c.mesh = [("data", -1)]
  c.sharding_strategy = [
      (".*FREEZE_ME.*", "replicate"),
      (".*", 'fsdp(axis="data")'),
  ]
  c.sharding_rules = [("act_batch", ("data",))]

  c.evals = {}
  c.evals.val = dict(
      type="mean", pred="validation",
      data=dict(name="coco_captions", split="val"),
      pp_fn=c.input["pp"].replace("|flip_lr", ""),
      log_steps=1000)
  return c
