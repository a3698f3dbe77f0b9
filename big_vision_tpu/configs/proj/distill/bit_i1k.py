"""Patient-and-consistent distillation of BiT-R152x2 into BiT-R50 on
ImageNet-1k (arXiv:2106.05237).

Parity target: reference configs/proj/distill/bit_i1k.py.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc
import big_vision_tpu.configs.proj.distill.common as cd
from big_vision_tpu.configs.common_fewshot import get_fewshot_lsr


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, runlocal=False)
  config = mlc.ConfigDict()
  config.seed = 0

  config.input = dict(
      data=dict(name="imagenet2012", split="train[:98%]"),
      batch_size=4096 if not arg.runlocal else 16,
      shuffle_buffer_size=250_000 if not arg.runlocal else 50,
  )
  config.num_classes = 1000
  config.total_epochs = 1200
  config.init_shapes = [(1, 224, 224, 3)]

  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.student_name = "bit_paper"
  config.student = dict(depth=50, width=1)

  config.teachers = ["prof_m"]
  config.prof_m_name = "bit_paper"
  config.prof_m_init = cd.inits["BiT-M R152x2 imagenet2012 ic224"]
  config.prof_m = dict(depth=152, width=2)

  pp_common = ("|value_range(-1, 1)"
               "|onehot(1000, key='{lbl}', key_result='labels')"
               "|keep('image', 'labels')")
  config.input["pp"] = (
      "decode_jpeg_and_inception_crop(224)|flip_lr"
      + pp_common.format(lbl="label"))
  ppv = "decode|resize_small(256)|central_crop(224)" + pp_common

  config.mixup = dict(p=1.0, fold_in=None)
  config.distance = "kl"
  config.distance_kw = dict(t=1.0)

  config.grad_clip_norm = 1.0
  config.optax_name = "scale_by_adam"
  config.optax = dict(mu_dtype="bfloat16")
  config.lr = 0.03
  config.wd = 0.0003
  config.schedule = dict(warmup_steps=5000, decay_type="cosine")

  minival = "train[99%:]" if not arg.runlocal else "train[:16]"
  val = "validation" if not arg.runlocal else "validation[:16]"

  def get_eval(split, dataset="imagenet2012", lbl="label"):
    return dict(
        type="classification", pred="student_fwd",
        data=dict(name=dataset, split=split),
        pp_fn=ppv.format(lbl=lbl), loss_name="softmax_xent",
        log_steps=1000)

  config.evals = {}
  config.evals.student_minival = get_eval(minival)
  config.evals.student_val = get_eval(val)
  config.evals.student_v2 = get_eval("test", dataset="imagenet_v2")
  config.evals.student_fewshot = get_fewshot_lsr(
      runlocal=arg.runlocal)
  config.evals.student_fewshot.pred = "student_fwd"
  config.evals.student_fewshot.log_steps = 10_000
  config.evals.teacher_val = dict(get_eval(val), pred="prof_m_fwd",
                                  log_steps=100_000)
  config.evals.distance_val = dict(
      type="proj.distill.distance", pred="student_prof_m_fwd",
      data=dict(name="imagenet2012", split=val),
      pp_fn=ppv.format(lbl="label") + "|keep('image')",
      log_steps=1000,
      distances=({"kind": "kl"}, {"kind": "euclidean"},
                 {"kind": "agree", "k": 1}))
  return config
