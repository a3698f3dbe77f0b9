"""TPU-native input pipeline: host-async loading, device-side preprocessing.

Replaces the reference's tf.data pipeline (input_pipeline.py) with:

  raw example stream (DataSource, this process's split)
    -> shuffle buffer over raw records (cheap: bytes, not pixels)
    -> host pp phase on a thread pool (JPEG decode + variable-shape ops)
    -> local batch collate (numpy)
    -> global jax.Array over all devices (make_fsarray_from_local_slice)
    -> device pp phase: one jitted, vmapped XLA program on the accelerator
    -> N-deep prefetch queue (so host work overlaps device compute)

The inference pipeline keeps the reference's multi-host exactness contract
(input_pipeline.py:176-236): every process emits the same number of batches
(ceil of the max per-process example count / local batch), padding with
zeros and marking real examples with "_mask"=1.
"""

from __future__ import annotations

import collections
import queue as queue_lib
import threading
import warnings

import jax
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.datasets import core as ds_core
from big_vision_tpu.pp import builder as pp_builder

# Internal keys are pipeline-owned and bypass the device pp phase.
_INTERNAL = ("_mask", "_id")


# ---------------------------------------------------------------------------
# Host side: example streams -> local numpy batches.
# ---------------------------------------------------------------------------


def _shuffled(stream, buffer_size, rng):
  """Streaming shuffle with a reservoir buffer (tf.data shuffle semantics)."""
  buf = []
  for ex in stream:
    if len(buf) < buffer_size:
      buf.append(ex)
      continue
    j = rng.integers(0, len(buf))
    yield buf[j]
    buf[j] = ex
  rng.shuffle(buf)
  yield from buf


def _repeated(source, seed):
  """Infinite raw-example stream, reshuffled each epoch."""
  epoch = 0
  while True:
    yield from source.get_examples(ordered=False, seed=seed, epoch=epoch)
    epoch += 1


def _pp_threaded(stream, pfn, num_threads, seed, filter_fn=None,
                 chunk_size=16, index_offset=0):
  """Ordered, bounded map of the host pp phase over a thread pool.

  Examples are submitted in chunks: one future per `chunk_size` examples.
  On a host with few cores the per-future overhead (submit/result locks,
  GIL churn) otherwise costs ~0.1ms per EXAMPLE — a double-digit share of
  a JPEG decode. Determinism is unchanged: each example's rng is keyed by
  its global stream index, not by thread or chunk.
  """
  import concurrent.futures
  if num_threads <= 1:
    # Same per-example rng keying as the threaded path (absolute stream
    # index): the stream is identical across thread counts and stays
    # sample-exact across resume seeks.
    for i, ex in enumerate(stream):
      rng = np.random.default_rng((seed, index_offset + i))
      with jax.transfer_guard("allow"):
        ex = pfn.host(ex, rng)
      if filter_fn is None or filter_fn(ex):
        yield ex
    return

  pool = concurrent.futures.ThreadPoolExecutor(num_threads)
  window = collections.deque()
  depth = num_threads * 2  # in-flight chunks

  def work(chunk, start):
    # Host-phase ops may execute eager jax on CPU (device-capable ops that
    # sit before a host-only op); those transfers are intentional.
    out = []
    with jax.transfer_guard("allow"):
      for j, ex in enumerate(chunk):
        # index_offset keeps per-example rng keys continuous across a
        # resume seek: example N of the run gets rng (seed, N) whether or
        # not the stream was fast-forwarded to reach it.
        rng = np.random.default_rng((seed, index_offset + start + j))
        out.append(pfn.host(ex, rng))
    return out

  def chunks():
    buf, start = [], 0
    for i, ex in enumerate(stream):
      buf.append(ex)
      if len(buf) == chunk_size:
        yield buf, start
        buf, start = [], i + 1
    if buf:
      yield buf, start

  try:
    for chunk, start in chunks():
      window.append(pool.submit(work, chunk, start))
      if len(window) >= depth:
        for out in window.popleft().result():
          if filter_fn is None or filter_fn(out):
            yield out
    while window:
      for out in window.popleft().result():
        if filter_fn is None or filter_fn(out):
          yield out
  finally:
    pool.shutdown(wait=False, cancel_futures=True)


def _skipped(stream, n):
  """Drops the first n raw examples (pre-decode: cheap byte dicts).

  Sample-exact resume: the shuffled raw stream is deterministic given
  (source, seed), so skipping `resumed_step * local_batch` examples
  replays the interrupted run's stream position without decoding anything.
  """
  for _ in range(n):
    next(stream)
  return stream


def _collate(examples):
  """Stacks a list of example dicts; non-numeric values become object arrays."""
  out = {}
  for k in examples[0]:
    vals = [e[k] for e in examples]
    if isinstance(vals[0], (bytes, str)):
      out[k] = np.asarray(vals, dtype=object)
      continue
    arrs = [np.asarray(v) for v in vals]
    if (arrs[0].dtype.kind in "USO"
        or any(a.shape != arrs[0].shape for a in arrs)):
      # Ragged (e.g. per-example caption lists) or stringy: carry as an
      # object array — these keys ride host-side (keep_on_cpu contract).
      obj = np.empty(len(vals), dtype=object)
      for i, v in enumerate(vals):
        obj[i] = v
      out[k] = obj
    else:
      out[k] = np.stack(arrs)
  return out


def _batched(stream, batch_size, drop_remainder=True):
  buf = []
  for ex in stream:
    buf.append(ex)
    if len(buf) == batch_size:
      yield _collate(buf)
      buf = []
  if buf and not drop_remainder:
    yield _collate(buf)


# ---------------------------------------------------------------------------
# Device side: local batches -> global arrays + device pp.
# ---------------------------------------------------------------------------


def _is_numeric(v):
  return isinstance(v, np.ndarray) and v.dtype != object


def start_global(batch_iter, devices, n_prefetch=2, device_pp=None, seed=0,
                 keep_on_cpu=(), preserve_internal=False,
                 preserve_keys=(), step_offset=0):
  """Turns local numpy batches into prefetched global device batches.

  Numeric keys become jax.Arrays sharded over `devices` along the batch
  axis; `device_pp` (a PreprocessFn) then runs its device phase as one
  jitted program per batch. Non-numeric / keep_on_cpu keys ride along as
  host arrays. Internal keys ("_mask"...) bypass device pp.
  """
  dev_fn = None
  if device_pp is not None and device_pp.device_ops:
    dev_fn = jax.jit(device_pp.device)

  # Stage the host work (decode/collate) in its own thread so it overlaps
  # with the h2d transfers below (which mostly wait on DMA/network IO).
  if n_prefetch > 0:
    batch_iter = _prefetched(batch_iter, max(n_prefetch, 1))

  def produce():
    for step, batch in enumerate(batch_iter):
      host_part = {k: v for k, v in batch.items()
                   if not _is_numeric(v) or k in keep_on_cpu}
      dev_part = {k: v for k, v in batch.items() if k not in host_part}
      # The input feed is THE intended host->device boundary; the trainer
      # runs under transfer_guard("disallow") and this thread-local guard
      # marks these transfers as deliberate (ref utils.py:884 pattern).
      with jax.transfer_guard("allow"):
        gbatch = {k: u.make_fsarray_from_local_slice(v, devices)
                  for k, v in dev_part.items()}
        if dev_fn is not None:
          # The inference pipeline adds _mask/_id AFTER pp (reference
          # semantics, input_pipeline.py:176-236): re-attach them post-pp.
          # Pipeline-generated keys (sequence packing) are preserved too.
          protected = ((_INTERNAL if preserve_internal else ())
                       + tuple(preserve_keys))
          internal = {k: gbatch[k] for k in protected if k in gbatch}
          work = {k: v for k, v in gbatch.items() if k not in internal}
          # step_offset keeps the device-pp rng continuous across a
          # resume seek (same role as _pp_threaded's index_offset).
          work = dev_fn(work, jax.random.fold_in(jax.random.PRNGKey(seed),
                                                 step_offset + step))
          gbatch = {**work, **internal}
      yield {**gbatch, **host_part}

  return _prefetched(produce(), n_prefetch)


def _prefetched(it, depth):
  """Background-thread prefetch queue of `depth` ready batches."""
  if depth <= 0:
    yield from it
    return
  q = queue_lib.Queue(maxsize=depth)
  _SENTINEL = object()

  def run():
    try:
      for x in it:
        q.put(x)
    except BaseException as e:  # surface errors to the consumer
      q.put(e)
      return
    q.put(_SENTINEL)

  t = threading.Thread(target=run, daemon=True)
  t.start()
  while True:
    x = q.get()
    if x is _SENTINEL:
      return
    if isinstance(x, BaseException):
      raise x
    yield x


# ---------------------------------------------------------------------------
# Public entry points (mirroring the reference's API shape).
# ---------------------------------------------------------------------------


def total_training_examples(input_config):
  """Total examples of config.input's data source(s), without building
  the pipeline (so trainers can resolve durations before deciding a
  resume position)."""
  data_cfg = dict(input_config)["data"]
  if isinstance(data_cfg, (list, tuple)):
    return sum(ds_core.get(**{k: v for k, v in dict(sub).items()
                              if k != "pp"}).total_examples
               for _, sub in data_cfg)
  return ds_core.get(**data_cfg).total_examples


def training(input_config, *, devices=None, seed=0, skip_examples=0):
  """Builds the training iterator from config.input.

  Returns (iterator of global batches, total train examples). Weighted
  mixture configs (data = [(weight, cfg), ...]) interleave sources by
  sampled weight.

  skip_examples > 0 fast-forwards this process's raw stream by that many
  examples before any decoding — sample-exact preemption resume (the
  reference restarts the stream from scratch on resume). For mixtures the
  mixture-choice rng is replayed so each sub-stream advances by exactly
  the examples the interrupted run consumed from it. Unsupported (warned,
  ignored) with sequence packing, where examples-per-step is variable.
  """
  devices = devices if devices is not None else jax.devices()
  cfg = dict(input_config)
  batch_size = cfg["batch_size"]
  assert batch_size % jax.process_count() == 0, (batch_size,
                                                 jax.process_count())
  local_batch = batch_size // jax.process_count()
  n_local_devs = (sum(d.process_index == jax.process_index()
                      for d in devices) or len(devices))
  if local_batch % n_local_devs:
    raise ValueError(
        f"input.batch_size={batch_size} gives a per-process batch of "
        f"{local_batch}, not divisible by this process's {n_local_devs} "
        f"devices — training batches cannot be padded; raise batch_size "
        f"to a multiple of {n_local_devs * jax.process_count()}.")
  pfn = pp_builder.get_preprocess_fn(cfg.get("pp"))
  # Default pp threads: 4/core (decode releases the GIL; more is churn on
  # few-core hosts — measured 4 threads 657 vs 8 threads 566 img/s on a
  # 1-CPU host). Configs may still set any explicit value.
  import os as _os
  num_threads = cfg.get("num_threads")
  if num_threads is None:  # explicit 0 = inline single-threaded path
    num_threads = min(16, max(4, (_os.cpu_count() or 1) * 4))
  shuffle_buffer = cfg.get("shuffle_buffer_size")
  if not shuffle_buffer:
    # A missing/None/0 buffer means NO shuffling — silent accuracy loss on
    # real training runs. Reference configs always set it; be loud here.
    warnings.warn(
        "input.shuffle_buffer_size is unset: the training stream will NOT "
        "be shuffled. Set shuffle_buffer_size (e.g. 250_000 for ImageNet) "
        "or shuffle_buffer_size=1 to acknowledge sequential reads.",
        stacklevel=2)
    shuffle_buffer = 1

  if skip_examples and cfg.get("pack"):
    warnings.warn(
        "skip_examples is not sample-exact with sequence packing "
        "(variable examples per step); resuming without stream seek.",
        stacklevel=2)
    skip_examples = 0

  data_cfg = cfg["data"]
  if isinstance(data_cfg, (list, tuple)):
    sources = []
    for weight, sub in data_cfg:
      sub = dict(sub)
      sub_pp = sub.pop("pp", cfg.get("pp"))
      sources.append((weight, ds_core.get(**sub),
                      pp_builder.get_preprocess_fn(sub_pp)))
    total = sum(s.total_examples for _, s, _ in sources)
    weights = np.asarray([w for w, _, _ in sources], np.float64)
    weights /= weights.sum()
    cum_weights = np.cumsum(weights)
    rng = np.random.default_rng((seed, 23))
    # Sample-exact seek: replay the interrupted run's mixture choices so
    # (a) each sub-stream skips exactly what that run consumed from it and
    # (b) the choice rng continues from the same position. Selection is
    # one uniform per example (searchsorted over cumulative weights), so
    # the replay is a single vectorized draw — rng.random(N) consumes the
    # identical bit stream as N live rng.random() calls — instead of
    # millions of Python-level choice() calls at large resume steps.
    if skip_examples:
      draws = np.searchsorted(cum_weights, rng.random(skip_examples),
                              side="right")
      per_source_skip = np.bincount(
          draws, minlength=len(sources)).tolist()
    else:
      per_source_skip = [0] * len(sources)
    streams = [
        _pp_threaded(
            _skipped(
                _shuffled(_repeated(s, seed), shuffle_buffer,
                          np.random.default_rng((seed, 17, i))),
                per_source_skip[i]),
            pf, num_threads, seed=seed * 1000 + i,
            index_offset=per_source_skip[i])
        for i, (_, s, pf) in enumerate(sources)]

    def mixed():
      while True:
        yield next(streams[int(np.searchsorted(cum_weights, rng.random(),
                                               side="right"))])
    examples = mixed()
    device_pp = pfn  # device phase of the top-level pp (shared suffix)
  else:
    source = ds_core.get(**data_cfg)
    total = source.total_examples
    raw = _repeated(source, seed)
    raw = _shuffled(raw, shuffle_buffer, np.random.default_rng((seed, 17)))
    raw = _skipped(raw, skip_examples)
    examples = _pp_threaded(raw, pfn, num_threads, seed=seed,
                            index_offset=skip_examples)
    device_pp = pfn

  preserve_keys = ()
  if pack := cfg.get("pack"):
    # Sequence packing: combine short (tokenized) examples into full rows
    # with _segmentation/_position keys (datasets/sequence_packing.py).
    # Those generated keys survive the device pp phase (a trailing keep()
    # in the pp string cannot know about them).
    from big_vision_tpu.datasets import sequence_packing
    examples = sequence_packing.pack_examples(examples, dict(pack))
    preserve_keys = tuple(f"{k}_{s}" for k in dict(pack)
                          for s in ("segmentation", "position"))

  batches = _batched(examples, local_batch, drop_remainder=True)
  it = start_global(batches, devices,
                    n_prefetch=cfg.get("prefetch", 2),
                    device_pp=device_pp, seed=seed,
                    keep_on_cpu=cfg.get("keep_on_cpu", ()),
                    preserve_keys=preserve_keys,
                    step_offset=skip_examples // local_batch)
  return it, total


def training_from_step(input_config, first_step, *, devices=None, seed=0):
  """Training iterator positioned at `first_step` (sample-exact resume).

  The shared resume-seek recipe used by every trainer: skip
  first_step * local_batch raw examples (pre-decode) unless the config
  opts out with input.resume_seek=False. Returns just the iterator
  (use total_training_examples() for duration resolution, which trainers
  need before the resume step is known).
  """
  cfg = dict(input_config)
  skip = 0
  if first_step and cfg.get("resume_seek", True):
    skip = first_step * (cfg["batch_size"] // jax.process_count())
    u.write_note(f"Seeking input stream to step {first_step} "
                 f"({skip} raw examples per process)...")
  with jax.transfer_guard("allow"):
    it, _ = training(input_config, devices=devices, seed=seed,
                     skip_examples=skip)
  return it


def element_spec(input_config, *, seed=0):
  """Per-example shapes/dtypes after the full pp chain, from ONE example.

  The reference trainer derives model-init shapes from tf.data's
  element_spec (ref train.py:195-197), so its configs never declare
  init_shapes. This TF-free equivalent pulls a single raw example, runs
  the host pp phase on it, and shape-traces (eval_shape, no execution)
  the device phase. Returns {key: jax.ShapeDtypeStruct} for numeric keys,
  without the batch dimension.
  """
  cfg = dict(input_config)
  data_cfg = cfg["data"]
  host_fn = pfn = pp_builder.get_preprocess_fn(cfg.get("pp"))
  if isinstance(data_cfg, (list, tuple)):  # mixture: all sources must agree
    _, sub = data_cfg[0]
    sub = dict(sub)
    host_fn = pp_builder.get_preprocess_fn(sub.pop("pp", cfg.get("pp")))
    data_cfg = sub
  source = ds_core.get(**data_cfg)
  ex = next(iter(source.get_examples(ordered=True, seed=seed, epoch=0)))
  ex = host_fn.host(dict(ex), np.random.default_rng(seed))
  # Collate like _batched does: scalars become ndarray rows; drop
  # non-numeric (string) keys, which ride on the host side of the feed.
  ex = {k: np.asarray(v) for k, v in ex.items()}
  batch = {k: v[None] for k, v in ex.items() if _is_numeric(v)}
  if pfn.device_ops:
    key = jax.ShapeDtypeStruct((2,), np.uint32)
    batch = jax.eval_shape(pfn.device, batch, key)
  return {k: jax.ShapeDtypeStruct(np.shape(v)[1:], np.asarray(v).dtype
                                  if not hasattr(v, "dtype") else v.dtype)
          for k, v in batch.items()}


def make_for_inference(data_cfg, pp, batch_size, *, devices=None,
                       num_batches=None, keep_on_cpu=(), seed=0,
                       num_threads=None, cache_raw=False):
  """Deterministic eval pipeline with the infinite-padding + _mask contract.

  Every process yields exactly `ceil(max_per_process / local_batch)` batches
  so jitted global reductions see identical batch counts everywhere.
  `cache_raw` memoizes this process's raw (pre-pp) examples in host RAM on
  first use, so repeat evals skip dataset IO but re-run pp (the reference's
  cache="raw_data" level, ref evaluators/common.py:128-134).
  Returns (make_iterator_fn, num_batches_per_process).
  """
  devices = devices if devices is not None else jax.devices()
  assert batch_size % jax.process_count() == 0
  local_batch = batch_size // jax.process_count()
  # The local slice is split evenly over this process's devices at the
  # host->HBM boundary (utils/mesh.py make_fsarray_from_local_slice), so a
  # local batch smaller than / not divisible by the local device count can
  # never be fed. Evals pad with _mask=0 examples anyway, so round UP: the
  # jitted fn sees a slightly larger batch whose tail is masked padding.
  n_local_devs = (sum(d.process_index == jax.process_index()
                      for d in devices) or len(devices))
  if local_batch % n_local_devs:
    padded = -(-local_batch // n_local_devs) * n_local_devs
    warnings.warn(
        f"make_for_inference: batch_size={batch_size} gives local batch "
        f"{local_batch}, not divisible by {n_local_devs} local devices; "
        f"padding the eval batch to {padded} (masked via the _mask "
        f"contract).")
    local_batch = padded
  source = ds_core.get(**data_cfg)
  pfn = pp_builder.get_preprocess_fn(pp)

  n_local = source.num_examples_per_process()
  # All processes must agree on the batch count: use the max split size.
  per_proc = [
      ds_core.even_split_bounds(source.total_examples, jax.process_count(), i)
      for i in range(jax.process_count())]
  max_local = max(stop - start for start, stop in per_proc)
  if num_batches is None:
    num_batches = -(-max_local // local_batch)  # ceil

  if cache_raw:
    raw_cache = []

    def raw_examples():
      if not raw_cache:
        raw_cache.extend(source.get_examples(ordered=True))
      return iter(raw_cache)
  else:
    raw_examples = lambda: source.get_examples(ordered=True)

  def example_stream():
    capacity = num_batches * local_batch
    count = 0
    proto = None
    import os
    nthreads = num_threads or min(16, max(4, (os.cpu_count() or 1) * 4))
    for ex in _pp_threaded(
        raw_examples(), pfn, num_threads=nthreads,
        seed=seed):
      if count >= capacity:
        break
      ex = dict(ex)
      ex["_mask"] = np.int32(1)
      proto = proto or {
          k: (b"" if isinstance(v, bytes) else "" if isinstance(v, str)
              else np.zeros_like(np.asarray(v)))
          for k, v in ex.items()}
      count += 1
      yield ex
    assert proto is not None, "Empty eval split on this process"
    pad = dict(proto, _mask=np.int32(0), _id=np.int64(-1))
    while count < capacity:
      count += 1
      yield dict(pad)

  def make_iter():
    batches = _batched(example_stream(), local_batch, drop_remainder=False)
    return start_global(batches, devices, n_prefetch=1, device_pp=pfn,
                        seed=seed, keep_on_cpu=keep_on_cpu,
                        preserve_internal=True)

  return make_iter, num_batches
