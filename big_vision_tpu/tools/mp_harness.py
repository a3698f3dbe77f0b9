"""Multi-PROCESS harness: run the real multi-host branches on one machine.

`jax.distributed.initialize` with a local coordinator + gloo CPU
collectives gives `jax.process_count() == N` with several virtual CPU
devices per process — the same topology class as an N-host TPU pod slice.
Driving the trainer through it executes the branches that a single-process
8-device mesh never reaches: per-process data splits
(input_pipeline.py:471-495), global-array assembly from local slices
(utils/mesh.py make_fsarray_from_local_slice), cross-process eval merges
(evaluators/common.py process_sum / multiprocess_write_json), the chrono
broadcast (train.py process_count>1 path), and multi-process checkpoint
write/restore. Reference machinery being validated:
big_vision/evaluators/common.py:167-228, utils.py:1388-1442, train.py:76-77.

Usage (the launcher spawns the workers):

  from big_vision_tpu.tools import mp_harness
  mp_harness.launch(tmpdir, nproc=2, devices_per_proc=4)

or as a worker (internal):

  python -m big_vision_tpu.tools.mp_harness <coord> <pid> <nproc> <tmp> <arg>
"""

import json
import os
import socket
import subprocess
import sys
import time


def free_port():
  s = socket.socket()
  s.bind(("localhost", 0))
  port = s.getsockname()[1]
  s.close()
  return port


def read_metrics(workdir):
  rows = []
  with open(os.path.join(workdir, "big_vision_metrics.txt")) as f:
    for line in f:
      rows.append(json.loads(line))
  return rows


def launch(tmpdir, nproc=2, devices_per_proc=4, timeout=1500,
           smoke_arg="total_steps=4,batch_size=16,res=32,log=1,ckpt=2"):
  """Spawns nproc worker processes; raises unless ALL exit 0 with markers.

  Returns the combined worker logs (for 'Resuming from' style asserts).
  Each worker runs: full train -> preempted train -> resume ->
  cross-process json merge, and worker 0 asserts the resumed step-final
  loss bit-matches the uninterrupted run's.
  """
  repo = os.path.dirname(os.path.dirname(
      os.path.dirname(os.path.abspath(__file__))))
  coord = f"localhost:{free_port()}"
  env = {
      **os.environ,
      "JAX_PLATFORMS": "cpu",
      # Drop any axon/site jax plugin: workers must come up as pure CPU.
      "PYTHONPATH": repo,
      "XLA_FLAGS": f"--xla_force_host_platform_device_count="
                   f"{devices_per_proc}",
  }
  logs = [os.path.join(tmpdir, f"mp_worker{i}.log") for i in range(nproc)]
  procs = []
  for i in range(nproc):
    with open(logs[i], "w") as logf:
      procs.append(subprocess.Popen(
          [sys.executable, "-m", "big_vision_tpu.tools.mp_harness",
           coord, str(i), str(nproc), tmpdir, smoke_arg],
          env=env, cwd=repo, stdout=logf, stderr=subprocess.STDOUT))
  deadline = time.time() + timeout
  try:
    for p in procs:
      p.wait(timeout=max(1.0, deadline - time.time()))
  finally:
    for p in procs:
      if p.poll() is None:
        p.kill()
  texts = []
  for i, p in enumerate(procs):
    with open(logs[i]) as f:
      texts.append(f.read())
    if p.returncode != 0:
      raise RuntimeError(
          f"mp_harness worker {i}/{nproc} rc={p.returncode}:\n"
          f"{texts[i][-4000:]}")
    if not os.path.exists(os.path.join(tmpdir, f"mp_ok.{i}")):
      raise RuntimeError(f"mp_harness worker {i} exited 0 without its OK "
                         f"marker:\n{texts[i][-4000:]}")
  return "\n".join(texts)


class YesNoTok:
  """Stub tokenizer: token 2 = 'yes', 3 = 'no', 1 = eos."""
  eos_token = 1

  def to_str(self, tokens, *, stop_at_eos=True):
    import numpy as np
    words = []
    for t in np.asarray(tokens).reshape(-1):
      if stop_at_eos and t == 1:
        break
      words.append({2: "yes", 3: "no"}.get(int(t), "?"))
    return " ".join(words)

  def to_int(self, text, **kw):
    inv = {"yes": 2, "no": 3}
    return [inv[w] for w in text.split()]


def eval_exactness_setup(n=13):
  """(data, decode_fn) for the CPU-scored eval-exactness check.

  The pixel value encodes the example index, so the fake decode's answer
  depends only on example CONTENT — any process/device topology must
  yield identical metrics. n=13 over batch 8 makes per-process counts
  ragged (7/6 on 2 procs) and forces padded batch slots, exercising the
  `_mask`/infinite-padding contract (ref input_pipeline.py:176-236) and
  the cross-process sufficient-statistics reduction
  (ref evaluators/common.py:167-228).
  """
  import jax
  import jax.numpy as jnp
  import numpy as np

  data = {
      "image": [np.full((2, 2, 3), i, np.float32) for i in range(n)],
      "question_id": np.arange(100, 100 + n),
      # Model says yes on even idx; GT is yes on idx % 3 == 0.
      "answer": ["yes" if i % 3 == 0 else "no" for i in range(n)],
  }

  @jax.jit
  def decode_from_pixels(img):
    idx = jnp.round(jnp.mean(img, axis=(1, 2, 3))).astype(jnp.int32)
    tok = jnp.where(idx % 2 == 0, 2, 3)
    return jnp.stack([tok, jnp.ones_like(tok)], axis=1)  # [B, 2] + eos

  return data, lambda train_state, batch: decode_from_pixels(batch["image"])


def run_eval_exactness(devices, batch_size=8):
  """Runs the vqa DecodeScorer at both cache levels; returns metric dicts."""
  import big_vision_tpu.pp.tokenizer as bvt_tok
  from big_vision_tpu.evaluators.proj.paligemma.transfers import vqa

  bvt_tok.get_tokenizer = lambda spec: YesNoTok()  # stub, no sp model
  data, decode = eval_exactness_setup()
  out = {}
  for cache in ("none", "final_data"):
    ev = vqa.Evaluator(decode, tokenizer="stub", outfile=None,
                       data=dict(name="arrays", data=data), pp_fn="",
                       devices=devices, batch_size=batch_size, cache=cache)
    out[cache] = {k: (v.item() if hasattr(v, "item") else v)
                  for k, v in ev.run(None)}
  assert out["none"] == out["final_data"], out
  return out


def _worker(coord, pid, nproc, tmpdir, smoke_arg):
  import jax
  jax.config.update("jax_platforms", "cpu")
  jax.config.update("jax_cpu_collectives_implementation", "gloo")
  jax.distributed.initialize(coordinator_address=coord,
                             num_processes=nproc, process_id=pid)
  assert jax.process_count() == nproc, jax.process_count()

  from big_vision_tpu import train
  from big_vision_tpu.configs import smoke
  import big_vision_tpu.evaluators.common as c

  def cfg(extra=""):
    conf = smoke.get_config(smoke_arg + extra)
    conf.schedule = dict(warmup_steps=1, decay_type="cosine")
    conf.input.num_threads = 2
    conf.input.prefetch = 0
    return conf

  total = cfg().total_steps
  wd_full = os.path.join(tmpdir, "full")
  wd_resumed = os.path.join(tmpdir, "resumed")
  train.main(config=cfg(), workdir=wd_full)
  train.main(config=cfg(f",stop={max(1, total // 2)}"), workdir=wd_resumed)
  train.main(config=cfg(), workdir=wd_resumed)

  # Cross-process record merge: deliberately unequal per-process counts so
  # the variable-length gather path is exercised.
  recs = [{"pid": pid, "i": i} for i in range(2 + pid)]
  merged = c.multiprocess_write_json(os.path.join(tmpdir, "merged.json"),
                                     recs)
  want = sum(2 + p for p in range(nproc))
  assert len(merged) == want, (len(merged), want)
  assert sorted(r["pid"] for r in merged) == sorted(
      p for p in range(nproc) for _ in range(2 + p)), merged

  # CPU-scored evaluator with ragged per-process counts, both cache
  # levels; every process computes the same global metrics (process_sum).
  eval_metrics = run_eval_exactness(list(jax.devices()))
  if pid == 0:
    with open(os.path.join(tmpdir, "mp_eval_exactness.json"), "w") as f:
      json.dump(eval_metrics, f)

  if pid == 0:  # Only process 0 has the metric files.
    def losses(wd):
      return {r["step"]: r["training_loss"] for r in read_metrics(wd)
              if "training_loss" in r}
    la, lb = losses(wd_full), losses(wd_resumed)
    assert la[total] == lb[total], (
        f"2-process resume not sample-exact: step-{total} loss "
        f"{lb[total]} != {la[total]}")
    vals = [r for r in read_metrics(wd_full) if "val/prec@1" in r]
    assert vals, "classification evaluator produced no cross-process metric"
    with open(os.path.join(tmpdir, "mp_metrics.json"), "w") as f:
      json.dump(read_metrics(wd_full), f)

  with open(os.path.join(tmpdir, f"mp_ok.{pid}"), "w") as f:
    json.dump({"merged": len(merged), "devices": jax.device_count()}, f)
  print(f"MP_WORKER_OK pid={pid} procs={nproc} "
        f"global_devices={jax.device_count()} "
        f"local_devices={jax.local_device_count()}")
  jax.distributed.shutdown()


if __name__ == "__main__":
  _coord, _pid, _nproc, _tmp, _arg = sys.argv[1:6]
  _worker(_coord, int(_pid), int(_nproc), _tmp, _arg)
