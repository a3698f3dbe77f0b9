"""JetFormer class-conditional generation on ImageNet 256px.

Parity target: reference
configs/proj/jetformer/jetformer_imagenet2012.py (arXiv:2411.19722).
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc

MODELS = {
    "350M": dict(width=1024, depth=24, mlp_dim=4096, num_heads=16,
                 num_kv_heads=1, head_dim=64),
    "1p3B": dict(width=1536, depth=48, mlp_dim=6144, num_heads=16,
                 num_kv_heads=1, head_dim=96),
}
NVP_BLOCK_DEPTH = {"350M": 4, "1p3B": 6}
SAMPLING = {"350M": (3, 0.94), "1p3B": (2, 0.93)}  # (cfg_w, temp)


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=256, patch_size=16, model_size="350M",
                       total_epochs=100, use_adaptor=True,
                       runlocal=False)
  c = mlc.ConfigDict()
  c.seed = 0
  c.total_epochs = arg.total_epochs

  c.input = dict(
      data=dict(name="imagenet2012", split="train[4096:]"),
      batch_size=2048 if not arg.runlocal else 8,
      shuffle_buffer_size=25_000 if not arg.runlocal else 10,
      pp=(f"decode|resize_small({arg.res}, method='bicubic',"
          " antialias=True)"
          f"|central_crop({arg.res})|flip_lr"
          "|value_range(-1, 1, key='image')"
          "|reshape((1,), inkey='label', outkey='text')"
          "|setdefault('text_loss', [1])"
          "|copy('text_loss', 'text_mask')"
          "|keep('image', 'text', 'text_mask', 'text_loss')"),
  )
  c.init_shapes = [(1, arg.res, arg.res, 3), (1, 1)]
  c.log_training_steps = 50
  c.ckpt_steps = 1000

  seq_len = (arg.res // arg.patch_size) ** 2
  subpix = arg.patch_size ** 2 * 3

  cfg_w, temp = SAMPLING[arg.model_size]
  c.sample_images = dict(cfg_inference_weight=cfg_w, temperature=temp,
                         temperature_probs=1.0)
  c.decode_len = seq_len

  c.patch_pca = mlc.ConfigDict()
  c.patch_pca.model_name = "proj.jetformer.patch_pca"
  c.patch_pca.model = mlc.ConfigDict(dict(
      depth_to_seq=1, input_size=(arg.res, arg.res),
      patch_size=(arg.patch_size, arg.patch_size),
      code_len=seq_len, codeword_dim=subpix,
      noise_std=0.0, add_dequant_noise=True, skip_pca=True))

  num_labels = 1000
  c.model_name = "proj.jetformer.jetformer"
  c.model = mlc.ConfigDict(MODELS[arg.model_size])
  c.model.bos_id = num_labels
  c.model.boi_id = num_labels + 1
  c.model.nolabel_id = num_labels + 2
  c.model.vocab_size = num_labels + 3
  c.model.out_dim = 128
  c.model.num_mixtures = 1024
  c.model.dropout = 0.1
  c.model.drop_labels_probability = 0.1
  c.model.head_dtype = "bfloat16"
  c.model.scan = True
  c.model.remat_policy = "nothing_saveable"
  c.model.num_vocab_repeats = 16

  c.input_noise_std = 0.3
  c.noise_scale = 64.0  # RGB-noise cosine curriculum.
  c.latent_noise_dim = subpix - c.model.out_dim
  c.text_prefix_prob = 1.0
  c.loss_on_prefix = False

  c.adaptor_name = "proj.jet.jet" if arg.use_adaptor else ""
  c.adaptor = mlc.ConfigDict()
  c.adaptor.model = dict(
      depth=32, block_depth=NVP_BLOCK_DEPTH[arg.model_size],
      emb_dim=512, num_heads=8, ps=1,
      kinds=("channels",),
      channels_coupling_projs=("random",),
      spatial_coupling_projs=("checkerboard", "checkerboard-inv"))

  c.optax_name = "scale_by_adam"
  c.optax = dict(b2=0.95)
  c.grad_clip_norm = 1.0
  c.ema_decay = 0.0
  c.lr = 0.001
  c.wd = 0.0001
  c.wd_mults = [
      ("^decoder/layers/attn/.*", 1.0),
      ("^decoder/layers/mlp/.*", 1.0),
      (".*/kernel$", 1.0),
  ]
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
      data=dict(name="imagenet2012", split="train[:4096]"),
      pp_fn=c.input["pp"].replace("|flip_lr", ""),
      log_steps=1000)
  return c
