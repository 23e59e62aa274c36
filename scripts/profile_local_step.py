"""Op-family breakdown of the local-prior denoise step from a profiler
trace. Runs a short local chain under jax.profiler.trace and aggregates
device-event durations by op family.

    python scripts/profile_local_step.py [STEPS=30] [BATCH=16]
"""
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FAMILIES = [
    ("conv3d", re.compile(r"conv3d|conv_kernel|_conv")),
    ("voxelize", re.compile(r"vox_kernel|voxel")),
    ("devox", re.compile(r"devox")),
    ("ball_query", re.compile(r"ball_query|bq_")),
    ("fps", re.compile(r"fps|furthest")),
    ("three_nn", re.compile(r"three_nn|interp")),
    ("fusion", re.compile(r"^fusion")),
    ("matmul", re.compile(r"dot|matmul|convolution")),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape")),
    ("dynamic-slice/update", re.compile(r"dynamic")),
]


def family(name):
    for fam, pat in FAMILIES:
        if pat.search(name):
            return fam
    return "other"


def main():
    from lion_tpu.models import LION
    from __graft_entry__ import _flagship_cfg

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    cfg = _flagship_cfg()
    cfg.ddpm.num_steps = max(steps, 10)
    cfg.tpu.bf16 = True
    lion = LION(cfg)
    lion.init_params(jax.random.PRNGKey(0))
    params = lion.params

    ts = jnp.arange(steps - 1, -1, -1)
    cond = jax.random.normal(jax.random.PRNGKey(2), (batch, lion.style_dim))
    # unflattened carry, matching LION.sample_chunked (kills the per-step
    # flat<->(B, N, C) relayout)
    x0 = jax.random.normal(
        jax.random.PRNGKey(3),
        (batch, lion.num_points, lion.local_dim // lion.num_points))

    @jax.jit
    def run(lp_params, x, rng, cond, ts):
        def fn(xx, timestep):
            return lion.local_prior.apply(
                {"params": lp_params}, xx, timestep.astype(jnp.float32),
                condition_input=cond)
        return lion.diffusion._denoise_ts(fn, rng, x, ts)

    rng = jax.random.PRNGKey(4)
    out, _ = run(params["local_prior"], x0, rng, cond, ts)
    _ = float(out.sum())

    trace_dir = "/tmp/lion_trace"
    os.system(f"rm -rf {trace_dir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        out, _ = run(params["local_prior"], x0, rng, cond, ts)
        _ = float(out.sum())
    wall = time.perf_counter() - t0
    print(f"wall: {wall:.3f} s for {steps} steps "
          f"({wall/steps*1e3:.2f} ms/step incl. host)")

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found"); return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)

    # device-side complete events only (TPU core lanes)
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in trace["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    fam_tot = collections.Counter()
    op_tot = collections.Counter()
    inst_tot = collections.Counter()   # full op names (fusion.17, ...)
    inst_cnt = collections.Counter()
    total = 0.0
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        fam_tot[family(name)] += dur
        op_tot[name.split(".")[0]] += dur
        inst_tot[name] += dur
        inst_cnt[name] += 1
        total += dur

    print(f"\ndevice total: {total:.1f} ms ({total/steps:.2f} ms/step)")
    print("\nby family (ms total / per step):")
    for fam, d in fam_tot.most_common():
        print(f"  {fam:<22s} {d:9.1f}  {d/steps:7.3f}")
    print("\ntop 25 ops:")
    for op, d in op_tot.most_common(25):
        print(f"  {op[:70]:<70s} {d:8.1f}  {d/steps:7.3f}")
    print("\ntop 30 op instances (full name, calls, us/call):")
    for op, d in inst_tot.most_common(30):
        n = inst_cnt[op]
        print(f"  {op[:70]:<70s} {d:8.1f}  n={n:<6d} {d/n*1e3:8.1f}")


if __name__ == "__main__":
    main()
