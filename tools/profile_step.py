"""Profile the bench chunk with jax.profiler and decode the chrome trace
locally into a top-ops table.

CLAUDE.md rule: the profiler trace (not ablation brackets) is the
decisive attribution tool on this backend — fusions carry source-line
metadata.  This tool runs the production fwd / fwd+bwd bench chunk a few
times under ``jax.profiler.start_trace`` and aggregates device-side op
durations from the ``.trace.json.gz`` file (no tensorboard needed; the
tunnel is too slow for xprof anyway).

Usage: python tools/profile_step.py [fwd|grad] [iters] [skyHxW]
e.g. python tools/profile_step.py grad 6 sky1536x3072
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(mode="grad", iters=6, logdir="/tmp/ptx-prof", sky=None):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ptx.core import rng as prng
    from ptx.integrate.camera import Camera, sample_rays
    from ptx.integrate.trace import compile_scene, trace_rays
    from ptx.scenes.builders import make_world, procedural_sky_image

    width = height = 512
    depth = 16
    # match bench.py's benchmark-of-record chunk shape: H/4 (65k-ray
    # chunks) on the demo, H/2 for big-probe variants
    rows = height // (2 if sky else 4)
    sky_img = procedural_sky_image(*sky) if sky else None
    scene = compile_scene(make_world(sky_image=sky_img))
    cam = Camera.reference_demo(width, height)
    key = jax.random.PRNGKey(0)

    def chunk_loss(params, key, i):
        key = prng.fold(key, i)
        ys = jnp.arange(rows)
        o, d = sample_rays(cam, key, ys, jnp.arange(width), 1)
        radiance = trace_rays(scene, params, o, d, key, depth, remat=False)
        return jnp.mean(radiance)

    fn = jax.jit(jax.value_and_grad(chunk_loss) if mode == "grad"
                 else chunk_loss)
    out = fn(scene.params, key, jnp.int32(0))
    jax.block_until_ready(out)

    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for i in range(iters):
        out = fn(scene.params, key, jnp.int32(i))
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return logdir, iters


def decode(logdir, iters, top=30):
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found under", logdir)
        return
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Use ONLY the device "XLA Ops" thread track: the module track and
    # step track nest the same time (double counting), host tracks are
    # noise.  Thread names arrive as metadata events.
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    src_by_name = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        if "XLA Ops" not in tname:
            continue
        name = e.get("name", "?")
        args = e.get("args", {}) or {}
        dur_by_name[name] += e["dur"]
        cnt_by_name[name] += 1
        total += e["dur"]
        src = args.get("source_info") or args.get("tf_op") or ""
        if src and name not in src_by_name:
            src_by_name[name] = src
    rows = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:top]
    print(f"device total: {total / 1e3 / iters:.3f} ms/iter "
          f"({len(dur_by_name)} distinct ops)")
    for name, d in rows:
        src = src_by_name.get(name, "")
        print(f"{d / 1e3 / iters:8.3f} ms  x{cnt_by_name[name] // iters:<4d}"
              f" {name[:80]:80s} {src[:60]}")
    # aggregate the long tail by source attribution so 1000 tiny fusions
    # still show up as one line
    agg = defaultdict(float)
    for name, d in dur_by_name.items():
        agg[src_by_name.get(name, "<no-source>")] += d
    print("\n--- by source ---")
    for src, d in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d / 1e3 / iters:8.3f} ms  {src[:100]}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "grad"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sky = None
    if len(sys.argv) > 3 and sys.argv[3].startswith("sky"):
        sky = tuple(int(v) for v in sys.argv[3][3:].split("x"))
    logdir, iters = run(mode, iters, sky=sky)
    decode(logdir, iters)
