"""ColTran FID-5K evaluator: Frechet distance between feature Gaussians.

Parity target: reference evaluators/proj/uvim/coltran_fid.py, which uses
tensorflow_gan + a tfhub Inception module — neither is in this image. The
FID math (Frechet distance between Gaussian moments, Heusel et al.,
arXiv:1706.08500) is implemented natively below; the feature extractor is
injectable (`feature_fn`) and defaults to a gated error pointing at the
missing Inception dependency. Reference statistics can be supplied as an
npz with `mu`/`sigma` arrays.
"""

from __future__ import annotations

import jax
import numpy as np
import scipy.linalg

import big_vision_tpu.evaluators.common as c

API = "jit"


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
  """||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2))."""
  diff = mu1 - mu2
  covmean = scipy.linalg.sqrtm(sigma1 @ sigma2)
  if not np.isfinite(covmean).all():
    offset = np.eye(sigma1.shape[0]) * eps
    covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
  if np.iscomplexobj(covmean):
    covmean = covmean.real
  return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
               - 2 * np.trace(covmean))


def gaussian_stats(features):
  mu = np.mean(features, axis=0)
  sigma = np.cov(features, rowvar=False)
  return mu, np.atleast_2d(sigma)


class Evaluator:
  """FID between predicted-image features and reference statistics."""

  def __init__(self, predict_fn, reference_stats=None, feature_fn=None,
               inception_ckpt=None, predict_kwargs=None, *, data, devices,
               **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        data=data, devices=devices, **kw)
    self.predict_fn = predict_fn
    self.predict_kwargs = predict_kwargs or {}
    if feature_fn is None and inception_ckpt:
      # Default extractor: the native flax InceptionV3 (pool3, 2048-d)
      # with converted standard FID weights — the tf_gan/tfhub-free path.
      from big_vision_tpu.models.proj.uvim import inception
      feature_fn = inception.feature_fn_from_ckpt(inception_ckpt)
    self.feature_fn = feature_fn
    self.reference_stats = reference_stats

  def _features(self, images):
    if self.feature_fn is None:
      raise NotImplementedError(
          "coltran_fid needs an Inception feature extractor "
          "(tensorflow_gan/tfhub in the reference). Set inception_ckpt= "
          "to a converted FID-InceptionV3 npz (see "
          "models/proj/uvim/inception.py), pass feature_fn=, or use "
          "save_predictions + offline FID.")
    return np.asarray(self.feature_fn(images))

  def run(self, train_state):
    feats = []
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      dev_batch, _ = c.split_batch(batch)
      y = self.predict_fn(train_state, dev_batch, **self.predict_kwargs)
      (pred,) = y.values()
      mask = np.asarray(jax.device_get(dev_batch["_mask"])).astype(bool)
      feats.append(self._features(jax.device_get(pred))[mask])
    feats = np.concatenate(feats, axis=0)

    if isinstance(self.reference_stats, str):
      ref = np.load(self.reference_stats)
      mu_ref, sigma_ref = ref["mu"], ref["sigma"]
    else:
      mu_ref, sigma_ref = self.reference_stats
    mu, sigma = gaussian_stats(feats)
    if jax.process_index():
      return
    yield "FID", frechet_distance(mu, sigma, mu_ref, sigma_ref)
