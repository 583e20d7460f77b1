"""Per-op HBM traffic map of the compiled b128 infer step (round 5, VERDICT #1b).

The inference roofline (PROFILE.md) left a 38 ms gap between the 77.7 ms
bandwidth floor (@ the 819 GB/s paper constant) and the 115.7 ms measured
step. This locates the bytes: walk the optimized HLO of the exact b128
infer+NMS program, estimate each top-level instruction's HBM traffic as
(output bytes + operand bytes) — fusion internals never touch HBM, so
top-level edges ARE the traffic — and print the top sites + a category
rollup. Compares the sum against XLA's own cost_analysis() figure.

Run on the real chip (or CPU for structure): python tools/exp_traffic_map.py [batch]
"""
from __future__ import annotations

import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE.findall(shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


# one HLO instruction: `  %name = <shape(s)> opcode(%op1, %op2, ...), attrs`
_INSTR = re.compile(
    r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^=]*?\)|\S+))\s+([\w\-]+)\((.*)$")
_OPERAND = re.compile(r"%?([\w.\-]+)")


def parse_computations(hlo: str):
    """{comp_name: [(instr_name, out_bytes, opcode, [operand names], line)]}"""
    comps = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*{\s*$", line)
        if m and not line.startswith(" "):
            cur = m.group(1)
            comps[cur] = []
            continue
        if line.startswith("}"):
            cur = None
            continue
        if cur is None:
            continue
        mi = _INSTR.match(line)
        if not mi:
            continue
        name, shape_str, opcode, rest = mi.groups()
        # operands: names inside the first balanced paren group; cheap cut at
        # '), ' attribute boundary is fine for traffic accounting
        args = rest.split("), ")[0]
        operands = [o for o in _OPERAND.findall(args) if not o[0].isdigit()]
        comps[cur].append((name, shape_bytes(shape_str), opcode, operands, line.strip()))
    return comps


def category(opcode: str, line: str) -> str:
    if opcode == "fusion":
        mk = re.search(r"kind=k(\w+)", line)
        return f"fusion:{mk.group(1) if mk else '?'}"
    return opcode


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    imgsz = 640
    from yolo_dbl_tpu.nn.tasks import DetectionModel
    from yolo_dbl_tpu.ops.nms import non_max_suppression

    dtype = jnp.bfloat16
    model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=dtype)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), imgsz=imgsz))

    def infer(v, img):
        pred = model.predict(v, img)
        return non_max_suppression(
            pred.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45, max_det=300)

    img_abs = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), dtype)
    v_abs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
    print(f"# lowering b{batch}@{imgsz} infer+NMS ...", flush=True)
    compiled = jax.jit(infer).lower(v_abs, img_abs).compile()
    an = compiled.cost_analysis()
    if isinstance(an, list):
        an = an[0]
    hlo = compiled.as_text()
    comps = parse_computations(hlo)

    # which computations execute per dispatch? ENTRY once; while bodies once
    # per trip — NMS iterations are data-dependent, so report them separately.
    entry = None
    for name, instrs in comps.items():
        if f"ENTRY %{name}" in hlo or f"ENTRY {name}" in hlo:
            entry = name
    if entry is None:  # fall back: the computation with the most instructions
        entry = max(comps, key=lambda k: len(comps[k]))

    out_bytes = {}
    for instrs in comps.values():
        for name, b, *_ in instrs:
            out_bytes[name] = b

    rows = []
    for name, b, opcode, operands, line in comps[entry]:
        if opcode in ("parameter", "constant", "get-tuple-element", "bitcast", "tuple"):
            continue  # no HBM traffic of their own
        traffic = b + sum(out_bytes.get(o, 0) for o in operands)
        rows.append((traffic, name, opcode, line))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)

    print(f"# ENTRY computation: {entry}  ({len(rows)} traffic-bearing instructions)")
    print(f"# summed top-level traffic: {total/1e9:.1f} GB   "
          f"XLA cost_analysis 'bytes accessed': {float(an.get('bytes accessed', 0))/1e9:.1f} GB")
    print(f"\n# top 30 instructions by (out + operands) bytes:")
    for traffic, name, opcode, line in rows[:30]:
        desc = line[:150]
        print(f"  {traffic/1e6:9.1f} MB  {desc}")

    cats = defaultdict(lambda: [0, 0])
    for traffic, name, opcode, line in rows:
        c = category(opcode, line)
        cats[c][0] += 1
        cats[c][1] += traffic
    print(f"\n# rollup by op category (ENTRY only):")
    for c, (n, b) in sorted(cats.items(), key=lambda kv: -kv[1][1]):
        print(f"  {c:28s} x{n:<5d} {b/1e9:8.2f} GB  {b/total*100:5.1f}%")

    # while-loop subcomputations (NMS fixpoint): per-iteration traffic
    wl = [(name, sum(b + sum(out_bytes.get(o, 0) for o in ops)
                     for _, b, op, ops, _ in instrs
                     if op not in ("parameter", "constant", "get-tuple-element",
                                   "bitcast", "tuple")))
          for name, instrs in comps.items()
          if name != entry and ("body" in name or "while" in name)]
    wl.sort(key=lambda kv: -kv[1])
    if wl:
        print(f"\n# while-body computations (execute once PER iteration):")
        for name, b in wl[:6]:
            print(f"  {b/1e6:9.1f} MB/iter  {name}")


if __name__ == "__main__":
    main()
