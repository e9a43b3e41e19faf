"""Capture a jax.profiler trace of the production chunked forward (one
25-step chunk at B), then report the top device ops by self time.

Usage: python tools/profile_step.py [--B 64] [--cap 2] [--ablate X]
Writes the trace under output/trace_step/ and prints a per-op summary
parsed from the trace protobuf (plane: TPU).
"""
import argparse, glob, gzip, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--cap", type=int, default=2)
    ap.add_argument("--ablate", default="")
    ap.add_argument("--out", default="output/trace_step")
    args = ap.parse_args()
    import jax, jax.numpy as jnp
    from diffcloth_tpu.config import SimFlags
    from diffcloth_tpu.core.sim import ClothSim
    from diffcloth_tpu.geometry import builder as gb
    from diffcloth_tpu.tasks.registry import TSHIRT_SCENE

    print("backend:", jax.default_backend(), flush=True)
    scene = gb.build_scene(TSHIRT_SCENE)
    sim = ClothSim(scene, flags=SimFlags(wind_enabled=True),
                   max_forward_iters=args.cap, plateau_window=10**6,
                   self_ablate=args.ablate)
    params = sim.default_params()
    p_inv = sim.p_inv(params)
    xfs = sim.x_fixed_seq(params)
    B = args.B
    pb = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (B,) + a.shape),
                      params)
    fwd_jit, _ = sim._chunk_execs(25, batched=True)
    idx_f = jnp.arange(1, 26, dtype=sim.dtype)
    xfs_b = jnp.broadcast_to(xfs[None, :25], (B, 25) + xfs.shape[1:])
    frozen = jnp.zeros((B,), bool)
    out = fwd_jit(pb.x0, pb.v0, frozen, pb, p_inv, xfs_b, idx_f)
    jax.block_until_ready(out)
    print("warm; tracing...", flush=True)
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        out = fwd_jit(pb.x0, pb.v0, frozen, pb, p_inv, xfs_b, idx_f)
        jax.block_until_ready(out)
    print("trace captured", flush=True)

    # parse: find the .trace.json.gz (perfetto) or xplane.pb
    cands = sorted(glob.glob(os.path.join(
        args.out, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if cands:
        with gzip.open(cands[-1], "rt") as f:
            data = json.load(f)
        evs = [e for e in data.get("traceEvents", [])
               if e.get("ph") == "X" and e.get("dur")]
        # keep device lanes only (TPU pids usually labeled)
        pidname = {}
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pidname[e["pid"]] = e["args"].get("name", "")
        dev_pids = {p for p, nm in pidname.items()
                    if "TPU" in nm or "tpu" in nm or "Device" in nm}
        agg = {}
        for e in evs:
            if dev_pids and e.get("pid") not in dev_pids:
                continue
            nm = e["name"].split(".")[0]
            agg[nm] = agg.get(nm, 0.0) + e["dur"]
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
        tot = sum(agg.values())
        print(f"total device op-time: {tot/1000:.2f} ms over 25 steps")
        for nm, us in top:
            print(f"  {us/1000:9.3f} ms  {100*us/max(tot,1):5.1f}%  {nm}")
    else:
        print("no perfetto trace found; files:",
              glob.glob(os.path.join(args.out, "**", "*"), recursive=True))


if __name__ == "__main__":
    main()
