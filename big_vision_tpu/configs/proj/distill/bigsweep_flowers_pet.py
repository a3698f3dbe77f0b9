"""Patient distillation of BiT-R152x2 into BiT-R50 on Flowers102 / Pets.

Parity target: reference configs/proj/distill/bigsweep_flowers_pet.py
(arXiv:2106.05237 "fast/medium/long" schedule sweep).
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc
import big_vision_tpu.configs.proj.distill.common as cd

H = {'flowers': {'fast': dict(epochs=1_000, lr=3e-3, wd=1e-4, t=10.), 'medium': dict(epochs=10_000, lr=1e-3, wd=1e-4, t=10.), 'long': dict(epochs=100_000, lr=3e-4, wd=1e-5, t=10.)}, 'pet': {'fast': dict(epochs=300, lr=1e-3, wd=1e-5, t=5.), 'medium': dict(epochs=1_000, lr=3e-4, wd=1e-5, t=2.), 'long': dict(epochs=30_000, lr=3e-4, wd=1e-5, t=1.)}}


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, runlocal=False, data="flowers",
                       variant="medium", crop="inception_crop(128)")
  config = mlc.ConfigDict()
  config.seed = 0

  datasets = {'flowers': (102, 'train', 'BiT-M R152x2 flowers rc128'), 'pet': (37, 'train[:90%]', 'BiT-M R152x2 pet rc128')}
  nclass, split, teacher = datasets[arg.data]
  config.input = dict(
      data=dict(name=arg.data if "_" in arg.data else
                dict(flowers='oxford_flowers102', pet='oxford_iiit_pet')[arg.data], split=split),
      batch_size=512 if not arg.runlocal else 16,
      shuffle_buffer_size=50_000 if not arg.runlocal else 50,
  )
  config.num_classes = nclass
  config.total_epochs = H[arg.data][arg.variant]["epochs"]
  config.init_shapes = [(1, 128, 128, 3)]

  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.student_name = "bit_paper"
  config.student = dict(depth=50, width=1)
  config.teachers = ["prof_m"]
  config.prof_m_name = "bit_paper"
  config.prof_m_init = cd.inits[teacher]
  config.prof_m = dict(depth=152, width=2)

  pp_common = ("|value_range(-1, 1)"
               "|onehot({}, key='label', key_result='labels')"
               "|keep('image', 'labels')").format(nclass)
  config.input["pp"] = f"decode|{arg.crop}|flip_lr" + pp_common
  ppv = "decode|resize_small(146)|central_crop(128)" + pp_common

  config.mixup = dict(p=1.0, fold_in=None)
  config.distance = "kl"
  config.distance_kw = dict(t=H[arg.data][arg.variant]["t"])

  config.grad_clip_norm = 1.0
  config.optax_name = "scale_by_adam"
  config.optax = dict(mu_dtype="bfloat16")
  config.lr = H[arg.data][arg.variant]["lr"]
  config.wd = H[arg.data][arg.variant]["wd"]
  config.schedule = dict(warmup_steps=500, decay_type="cosine")

  config.evals = dict(
      student_val=dict(
          type="classification", pred="student_fwd",
          data=dict(name=config.input["data"]["name"],
                        split="test"),
          pp_fn=ppv, loss_name="softmax_xent", log_steps=1000))
  return config
