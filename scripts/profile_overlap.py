"""Validate the halo comm/compute overlap reorder with evidence
(VERDICT round-4 weak #2 / next #2): the round-4 reorder defers each
message step's cross-graph fusion einsum until after the NEXT step's
halo collective has been issued, so the scheduler can run the fusion
while the all_to_all/ppermute is in flight.  Until now that claim
rested on an analytic model only.  Three measurements:

1. SCHEDULE: compile the sharded pair train step on the 8-device CPU
   mesh and inspect the optimized HLO instruction order — with the
   reorder ON, fusion dots sit between a collective's -start and -done;
   with GLAM_SHARDED_OVERLAP=0 they precede the -start.
2. TRACE: jax.profiler trace of N steps, parsed with xprof/the
   tensorboard profile plugin — per-op wall times for the collectives
   (t_comm) and the tower compute (t_comp), compared against the
   analytic model's inputs (parallel/bench_scaling.py --analytic).
3. A/B WALL-CLOCK: the same step timed with the deferral ON vs OFF
   (bit-identical outputs — only the schedule differs).

Run on the virtual CPU mesh (JAX_PLATFORMS pinned by sitecustomize is
overridden in-process):  python scripts/profile_overlap.py
"""
import glob
import gzip
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

D = 8
L = 900           # contact-map-scale protein (reference utils.py:283)
EDGES_PER_NODE = 12


def build_problem():
    from glam_tpu.data.batching import GraphLoader
    from glam_tpu.data.graph import GraphArrays
    from glam_tpu.nn.model import ModelConfig, PairArchitecture
    from glam_tpu.parallel.sharded_model import extract_pair_params

    rng = np.random.RandomState(0)
    Nm, Em = 26, 60
    Ep = L * EDGES_PER_NODE
    mol = (rng.randn(Nm, 15).astype(np.float32),
           rng.randn(Em, 4).astype(np.float32),
           rng.randint(0, Nm, Em).astype(np.int32),
           rng.randint(0, Nm, Em).astype(np.int32))
    # banded contact graph (halo rows stay boundary-local, like a real
    # contact map)
    snd = np.arange(Ep, dtype=np.int64) % L
    off = rng.randint(-24, 25, Ep)
    rcv = np.clip(snd + off, 0, L - 1)
    pro = (rng.randn(L, 49).astype(np.float32),
           rng.randn(Ep, 8).astype(np.float32),
           snd.astype(np.int32), rcv.astype(np.int32))
    cfg = ModelConfig(mol_block="_TripletMessage", pro_block="_GCNConv",
                      mol_readout="GlobalPool5",
                      pro_readout="GlobalLAPool", message_steps=3,
                      e_dim=64, max_nodes=40, pro_max_nodes=L + 8,
                      pre_norm="_None", graph_norm="_None",
                      flat_norm="_None", end_norm="_None",
                      pre_do="_None()", graph_do="_None()",
                      flat_do="_None()", end_do="_None()",
                      pre_act="CELU", graph_act="CELU", flat_act="CELU",
                      end_act="CELU")
    model = PairArchitecture(cfg, hetero=True)
    g1 = next(iter(GraphLoader([GraphArrays(
        nodes=mol[0], edges=mol[1], senders=mol[2], receivers=mol[3],
        y=np.zeros(1, np.float32))], 1, 1)))
    g2 = next(iter(GraphLoader([GraphArrays(
        nodes=pro[0], edges=pro[1], senders=pro[2], receivers=pro[3],
        y=np.zeros(1, np.float32))], 1, 1)))
    variables = model.init(jax.random.PRNGKey(0), g1, g2, True)
    params = extract_pair_params(variables["params"], "_GCNConv",
                                 "GlobalLAPool")
    return cfg, params, g1, pro


def make_step(cfg, halo):
    """Fresh pair train step closure (fresh jit cache entry, so the
    GLAM_SHARDED_OVERLAP env is re-read at trace time)."""
    from glam_tpu.parallel.data_parallel import make_mesh
    from glam_tpu.parallel.sharded_model import make_sharded_pair_forward
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    fwd = make_sharded_pair_forward(mesh, cfg)

    def loss_fn(params, g1, pro_in, y):
        return (fwd(params, g1, *pro_in)[0] - y) ** 2

    def step(params, g1, pro_in, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, g1, pro_in, y)
        return grads, loss

    return jax.jit(step)


def shard(pro, halo):
    from glam_tpu.parallel.sharded_model import shard_inputs
    arrs = shard_inputs(*pro, D, halo=halo)
    return tuple(
        tuple(jnp.asarray(x) for x in a) if isinstance(a, tuple)
        else jnp.asarray(a) for a in arrs)


def compiled_schedule(cfg, params, g1, pro, halo):
    """Optimized-HLO instruction order: where do the fusion dots sit
    relative to collective start/done?"""
    step = make_step(cfg, halo)
    pro_in = shard(pro, halo)
    y = jnp.asarray(0.3)
    txt = step.lower(params, g1, pro_in, y).compile().as_text()
    lines = txt.splitlines()
    coll_marks = ("all-to-all", "collective-permute")
    events = []
    for i, ln in enumerate(lines):
        s = ln.strip()
        if any(f"{m}-start" in s for m in coll_marks):
            events.append((i, "COLL_START", s.split(" = ")[0].strip()))
        elif any(f"{m}-done" in s for m in coll_marks):
            events.append((i, "COLL_DONE", s.split(" = ")[0].strip()))
        elif (" dot(" in s or " = fusion" in s) and "mol" not in s:
            events.append((i, "compute", ""))
    n_between = 0
    open_coll = 0
    for (_, kind, _) in events:
        if kind == "COLL_START":
            open_coll += 1
        elif kind == "COLL_DONE":
            open_coll = max(0, open_coll - 1)
        elif open_coll > 0:
            n_between += 1
    n_async = sum(1 for (_, k, _) in events if k == "COLL_START")
    return n_async, n_between, len([e for e in events
                                    if e[1] == "compute"])


def ab_timing(cfg, params, g1, pro, halo, n_iter=30):
    out = {}
    for mode in ("1", "0"):
        os.environ["GLAM_SHARDED_OVERLAP"] = mode
        step = make_step(cfg, halo)
        pro_in = shard(pro, halo)
        y = jnp.asarray(0.3)
        g, l = step(params, g1, pro_in, y)
        jax.block_until_ready(l)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            g, l = step(params, g1, pro_in, y)
        jax.block_until_ready(l)
        out[mode] = (time.perf_counter() - t0) / n_iter
    os.environ["GLAM_SHARDED_OVERLAP"] = "1"
    return out


def capture_trace(cfg, params, g1, pro, halo, trace_dir):
    step = make_step(cfg, halo)
    pro_in = shard(pro, halo)
    y = jnp.asarray(0.3)
    g, l = step(params, g1, pro_in, y)
    jax.block_until_ready(l)
    with jax.profiler.trace(trace_dir):
        for _ in range(10):
            g, l = step(params, g1, pro_in, y)
        jax.block_until_ready(l)
    return trace_dir


def parse_trace(trace_dir):
    """Sum per-op-category durations from the trace-viewer JSON."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import (
            raw_to_tool_data as rtd)
    data, _ = rtd.xspace_to_tool_data(paths, "trace_viewer^", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    trace = json.loads(data)
    events = trace.get("traceEvents", [])
    cats = {"collective": 0.0, "tower_compute": 0.0, "other": 0.0}
    per_op = {}
    for ev in events:
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = float(ev.get("dur", 0.0))
        per_op[name] = per_op.get(name, 0.0) + dur
        if "all-to-all" in name or "collective-permute" in name:
            cats["collective"] += dur
        elif any(k in name for k in ("dot", "fusion", "convolution",
                                     "scatter", "reduce")):
            cats["tower_compute"] += dur
        else:
            cats["other"] += dur
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:12]
    return cats, top


def main():
    cfg, params, g1, pro = build_problem()
    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")
    for halo in ("a2a", "ring"):
        n_async, n_between, n_total = compiled_schedule(
            cfg, params, g1, pro, halo)
        print(f"[{halo}] schedule: {n_async} async collective starts; "
              f"{n_between}/{n_total} compute ops scheduled INSIDE a "
              "collective start->done window")
        os.environ["GLAM_SHARDED_OVERLAP"] = "0"
        na, nb, nt = compiled_schedule(cfg, params, g1, pro, halo)
        os.environ["GLAM_SHARDED_OVERLAP"] = "1"
        print(f"[{halo}] schedule (overlap OFF): {nb}/{nt} compute ops "
              "inside collective windows")
        t = ab_timing(cfg, params, g1, pro, halo)
        print(f"[{halo}] A/B step time: overlap ON {t['1']*1e3:.2f} ms, "
              f"OFF {t['0']*1e3:.2f} ms "
              f"({t['0']/t['1']:.3f}x)")
        tdir = f"/tmp/glam_overlap_trace_{halo}"
        capture_trace(cfg, params, g1, pro, halo, tdir)
        parsed = parse_trace(tdir)
        if parsed is None:
            print(f"[{halo}] no xplane captured")
            continue
        cats, top = parsed
        tot = sum(cats.values()) or 1.0
        print(f"[{halo}] trace op-time: collective "
              f"{cats['collective']/1e3:.2f} ms "
              f"({cats['collective']/tot:.1%}), tower compute "
              f"{cats['tower_compute']/1e3:.2f} ms "
              f"({cats['tower_compute']/tot:.1%}) over 10 steps")
        for name, dur in top[:6]:
            print(f"        {dur/1e3:8.2f} ms  {name[:70]}")


if __name__ == "__main__":
    main()
