"""Optimized-HLO cost attribution of the production CPI trace.

The measured per-segment blocks (kernel 8.5 ms, body extras ~7, phase-1
~3.9; docs/PERF.md "Fixed-cost split") sit 25-100x above elementwise
roofline for 250k lanes.  Two rival explanations: (a) the body is HBM-
bound on whole-LaneState round trips across many fusion boundaries;
(b) it is per-op/fusion launch overhead.  This script settles it from
the COMPILER side: AOT-compile the production `_trace_cpi_jit`, print
XLA's aggregate cost analysis (flops / bytes accessed / transcendentals)
and a per-opcode + top-op table of output bytes parsed from the
optimized HLO.  One compile (~12 min cold), no timing runs.

Run alone (the axon tunnel serialises TPU processes).
"""
import argparse
import collections
import re
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
import bench as B

ap = argparse.ArgumentParser()
ap.add_argument("--pulses", type=int, default=8)
ap.add_argument("--rays", type=int, default=63)
ap.add_argument("--refine", action="store_true", default=False)
ap.add_argument("--dump", default="/tmp/cpi_hlo.txt")
args = ap.parse_args()

bargs = argparse.Namespace(
    tris=1000000, rays=args.rays, pulses=args.pulses, repeat=1, tri_chunk=2048,
    scene="terrain", accel="cluster", cluster_size=128,
    ray_tile=512, candidates=64, sub_tiles=8,
    mt_group=8, mt_union=True, cand_order="near",
    p1_fanout=8, p1_super_k=12, p1_fanout0=None, p1_super_k0=None,
    fan_order="raster", refine=args.refine, replay_cap=256,
    tiny=False, cpi256=False, stats=False,
)
base, batch, cfg, spec = B.build(bargs)[:4]

from rts_tpu.engine.cpi import _trace_cpi_jit

print("lowering...", flush=True)
lowered = _trace_cpi_jit.lower(base, batch, cfg, spec)
print("compiling...", flush=True)
compiled = lowered.compile()
print("compiled.", flush=True)

ca = compiled.cost_analysis()
if isinstance(ca, (list, tuple)):
    ca = ca[0]
keys = sorted(k for k in ca if not k.startswith("utilization"))
for k in keys:
    print(f"cost[{k}] = {ca[k]:.4g}")

ma = compiled.memory_analysis()
for k in ("argument_size_in_bytes", "output_size_in_bytes",
          "temp_size_in_bytes", "generated_code_size_in_bytes"):
    v = getattr(ma, k, None)
    if v is not None:
        print(f"mem[{k}] = {v/1e6:.1f} MB")

text = compiled.as_text()
with open(args.dump, "w") as f:
    f.write(text)
print(f"# optimized HLO -> {args.dump} ({len(text)/1e6:.1f} MB)", flush=True)

_DT = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
       "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}


def shape_bytes(s):
    # "f32[8,250047]{1,0}" or tuple "(f32[...], s32[...])"
    tot = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", s):
        dt = _DT.get(m.group(1))
        if dt is None:
            continue
        dims = m.group(2)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        tot += dt * n
    return tot


# Parse instruction lines of every computation: "%name = SHAPE opcode(".
by_opcode = collections.Counter()
by_opcode_bytes = collections.Counter()
tops = []
inst_re = re.compile(r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+((?:\([^)]*\)|\S+))\s+([\w\-]+)\(")
for line in text.splitlines():
    m = inst_re.match(line)
    if not m:
        continue
    name, shape, opcode = m.groups()
    b = shape_bytes(shape)
    by_opcode[opcode] += 1
    by_opcode_bytes[opcode] += b
    if b >= 1 << 20:
        tops.append((b, name, opcode, shape[:80]))

print("\n# per-opcode totals (count, output MB) — all computations")
for op, cnt in by_opcode.most_common(25):
    print(f"  {op:<22} n={cnt:<6} out={by_opcode_bytes[op]/1e6:10.1f} MB")

tops.sort(reverse=True)
print("\n# top instructions by output bytes (>=1 MB)")
for b, name, opcode, shape in tops[:45]:
    print(f"  {b/1e6:9.1f} MB  {opcode:<14} {name:<28} {shape}")

print("COST DONE", flush=True)
