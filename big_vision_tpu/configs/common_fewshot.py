"""Standard few-shot linear-probe evaluator config.

Parity target: reference configs/common_fewshot.py. Datasets here use TFDS
names (need tensorflow_datasets or a data_dir with prepared data).
"""

import ml_collections as mlc


def get_fewshot_lsr(target_resolution=224, resize_resolution=256,
                    runlocal=False, **kw):
  kw.setdefault("representation_layer", "pre_logits")
  kw.setdefault("shots", (1, 5, 10, 25))
  kw.setdefault("l2_reg", 2.0 ** 10)
  kw.setdefault("num_seeds", 3)
  kw.setdefault("display_first",
                [("imagenet", 10)] if not runlocal else [("pets", 10)])

  pp = (f"decode|resize({resize_resolution})"
        f"|central_crop({target_resolution})|value_range(-1,1)"
        "|keep('image', 'label')")

  def ds(name, train_split, test_split):
    return dict(
        data_train=dict(name=name, split=train_split),
        data_test=dict(name=name, split=test_split),
        pp=pp)

  config = mlc.ConfigDict(dict(
      type="fewshot_lsr",
      pred="represent",
      log_steps=25_000,
      datasets={
          "pets": {**ds("oxford_iiit_pet", "train", "test"),
                   "num_classes": 37},
          "flowers": {**ds("oxford_flowers102", "train", "test"),
                      "num_classes": 102},
          "cifar100": {**ds("cifar100", "train", "test"),
                       "num_classes": 100},
          "imagenet": {**ds("imagenet2012", "train[:10%]", "validation"),
                       "num_classes": 1000},
      } if not runlocal else {
          "pets": {**ds("oxford_iiit_pet", "train", "test"),
                   "num_classes": 37},
      },
      **kw,
  ))
  return config
