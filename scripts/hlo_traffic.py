"""Fusion-level HBM-traffic model from optimized HLO text.

XLA's ``cost_analysis()['bytes accessed']`` counts every operand of
every op INSIDE a fusion at full size, so values that only ever live in
registers/VMEM get billed as HBM traffic — measured 6.2x above the
physically-possible roofline on the YOLOX train step (TRAINBENCH r03
note), which makes ``fraction_of_roofline`` meaningless.  What actually
moves through HBM is the ENTRY-computation dataflow: each top-level
instruction (fusion, convolution, dot, custom-call, ...) reads its
operands from HBM and writes its result back.  Summing those buffer
sizes — a producer-consumer pair counted once on write and once on
read, which is what the memory system does — gives a defensible
traffic estimate to build a bandwidth roofline on.

Known approximations (documented, small for the train programs):
- ``while`` bodies (lax.scan) count once, not per trip — the only
  whiles in the train steps are small-k top-k scans with few-MB
  carries;
- an operand read twice by one instruction counts twice (worst case;
  XLA usually holds the reuse in VMEM);
- plumbing ops (parameter, tuple, get-tuple-element, bitcast,
  constant, ...) move no data and are skipped as instructions, but DO
  define names other instructions read through (a get-tuple-element of
  a fusion result is a view, so the read is billed at the gte's shape).

Parses the post-compilation ``compiled.as_text()`` (instruction-level
HLO python bindings are not exposed by jaxlib).
"""

from __future__ import annotations

import re

_NO_TRAFFIC_OPS = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "after-all", "add-dependency", "partition-id", "replica-id",
    "copy-start", "copy-done",
}

_BITS = {
    "pred": 8, "s4": 4, "u4": 4, "s8": 8, "u8": 8, "s16": 16, "u16": 16,
    "s32": 32, "u32": 32, "s64": 64, "u64": 64, "f8e4m3fn": 8,
    "f8e5m2": 8, "bf16": 16, "f16": 16, "f32": 32, "f64": 64,
    "c64": 64, "c128": 128,
}

_SHAPE_RE = re.compile(r"\b(" + "|".join(_BITS) + r")\[([0-9,]*)\]")
_OPCODE_RE = re.compile(r" ([a-z][a-z0-9-]*)\(")
_NAME_RE = re.compile(r"%[\w.+-]*|[\w.+-]+")


def _type_bytes(type_str: str) -> int:
    """Bytes of a result type string (tuples = sum of members)."""
    total = 0
    for prim, dims in _SHAPE_RE.findall(type_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += (n * _BITS[prim]) // 8
    return total


def _split_instruction(stripped: str):
    """'%name = <type> <opcode>(<operands>), attrs' -> parts or None."""
    if " = " not in stripped:
        return None
    lhs, rhs = stripped.split(" = ", 1)
    name = lhs.replace("ROOT", "").strip()
    m = _OPCODE_RE.search(rhs)
    if m is None:
        return None
    type_str = rhs[:m.start()]
    opcode = m.group(1)
    # first balanced paren group after the opcode = the operand list
    depth = 0
    start = m.end() - 1
    end = start
    for i in range(start, len(rhs)):
        if rhs[i] == "(":
            depth += 1
        elif rhs[i] == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    operands = rhs[start + 1:end]
    return name, type_str, opcode, operands


def hlo_entry_traffic(hlo_text: str) -> dict:
    """Sum operand+result bytes over the ENTRY computation's
    non-plumbing instructions.  Returns {'bytes', 'instructions'}."""
    # pass 1: name -> result bytes for EVERY entry instruction
    sizes = {}
    raw_lines = {}
    entry_lines = []
    in_entry = False
    for line in hlo_text.splitlines():
        stripped = line.strip()
        if stripped.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and stripped == "}":
            in_entry = False
            continue
        if not in_entry:
            continue
        parts = _split_instruction(stripped)
        if parts is None:
            continue
        name, type_str, opcode, operands = parts
        sizes[name.lstrip("%")] = _type_bytes(type_str)
        raw_lines[name.lstrip("%")] = stripped
        entry_lines.append((name, type_str, opcode, operands))

    total = 0
    n_instr = 0
    by_opcode = {}
    per_instr = []
    for name, type_str, opcode, operands in entry_lines:
        if opcode in _NO_TRAFFIC_OPS:
            continue
        n_instr += 1
        out_b = _type_bytes(type_str)               # result write

        def operand_bytes():
            if _SHAPE_RE.search(operands):
                return _type_bytes(operands)        # typed operand form
            b = 0
            for tok in operands.split(","):
                tok = tok.strip().lstrip("%")
                if tok in sizes:
                    b += sizes[tok]                 # operand read
            return b

        if opcode in ("slice", "dynamic-slice", "gather"):
            # these READ only result-shaped bytes from the (possibly
            # huge) operand — billing the full operand would overcount
            in_b = out_b
        elif opcode.endswith("-start"):
            # async wrapper pairs (async-start/-done around a fusion):
            # the start's tuple RESULT aliases its own operands plus the
            # eventual outputs — billing it double/triple-counts every
            # buffer.  Count reads at -start, writes at -done.
            in_b, out_b = operand_bytes(), 0
        elif opcode.endswith("-done") or opcode.endswith("-update"):
            in_b = 0                                # token/tuple alias
        else:
            in_b = operand_bytes()
        total += out_b + in_b
        by_opcode[opcode] = by_opcode.get(opcode, 0) + out_b + in_b
        per_instr.append((out_b + in_b, name.lstrip("%"), opcode,
                          raw_lines.get(name.lstrip("%"), "")))
    per_instr.sort(key=lambda t: -t[0])
    top = []
    for b, n, o, raw in per_instr[:30]:
        m = re.search(r'op_name="([^"]*)"', raw)
        top.append({"bytes": b, "name": n, "opcode": o,
                    # the jax op_name metadata says WHICH model op this
                    # buffer belongs to — the aim-here label
                    "op": m.group(1) if m else ""})
    return {"bytes": total, "instructions": n_instr,
            "by_opcode": dict(sorted(by_opcode.items(),
                                     key=lambda kv: -kv[1])),
            # the aim-here list: which instructions move the GB/step
            # (VERDICT r04: "no top-N table to aim at")
            "top": top}


def compiled_traffic(compiled) -> dict:
    """Traffic model for a jax ``.lower(...).compile()`` executable."""
    return hlo_entry_traffic(compiled.as_text())


# ---------------------------------------------------------------------------
# MXU FLOPs by operand dtype — the int8-honest roofline input
# ---------------------------------------------------------------------------

_TYPED_OPERAND_RE = re.compile(
    r"\b(" + "|".join(_BITS) + r")\[([0-9,]*)\][^ ]* %")
_DIM_LABELS_RE = re.compile(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)")
_CONTRACT_RE = re.compile(r"lhs_contracting_dims=\{([0-9,]+)\}")
_BATCH_DIMS_RE = re.compile(r"lhs_batch_dims=\{([0-9,]*)\}")


def _shape_dims(prim_dims):
    prim, dims = prim_dims
    return prim, [int(d) for d in dims.split(",") if d]


def _instr_operand_shapes(operands: str):
    """Typed operand list -> [(prim, [dims...]), ...]."""
    return [_shape_dims(m) for m in
            re.findall(r"\b(" + "|".join(_BITS) + r")\[([0-9,]*)\]",
                       operands)]


def hlo_flops_by_dtype(hlo_text: str) -> dict:
    """Sum 2*MACs of every ``convolution``/``dot`` in the module,
    bucketed by operand primitive type (s8 = the explicit int8 dataflow
    of ops/quant_static.py; bf16/f32 = everything else).

    Scans ALL computations (convs may sit inside fusions); ``while``
    bodies count once — same scan caveat as the traffic model.  TPU HLO
    references operands by bare name, so a module-wide name -> shape map
    resolves them.
    """
    # pass 1: every instruction's (prim, dims) by name, module-wide
    shapes = {}
    instrs = []
    for line in hlo_text.splitlines():
        parts = _split_instruction(line.strip())
        if parts is None:
            continue
        name, type_str, opcode, operands = parts
        m = _SHAPE_RE.search(type_str)
        if m:
            shapes[name.lstrip("%")] = _shape_dims(m.groups())
        instrs.append((line.strip(), type_str, opcode, operands))

    def operand_shapes(operands):
        typed = _instr_operand_shapes(operands)
        if typed:
            return typed
        out = []
        for tok in operands.split(","):
            tok = tok.strip().lstrip("%")
            if tok in shapes:
                out.append(shapes[tok])
        return out

    out = {}
    for stripped, type_str, opcode, operands in instrs:
        if opcode not in ("convolution", "dot"):
            continue
        ops = operand_shapes(operands)
        if len(ops) < 2:
            continue
        (lhs_prim, lhs_dims), (rhs_prim, rhs_dims) = ops[0], ops[1]
        res = _SHAPE_RE.search(type_str)
        if res is None:
            continue
        _, out_dims = _shape_dims(res.groups())
        out_elems = 1
        for d in out_dims:
            out_elems *= d
        if opcode == "convolution":
            m = _DIM_LABELS_RE.search(stripped)
            if m is None:
                continue
            rhs_spec = m.group(2)
            # kernel spec: digits = spatial, i = input features
            # (already / feature_group_count in the kernel shape)
            red = 1
            for ch, d in zip(rhs_spec, rhs_dims):
                if ch.isdigit() or ch == "i":
                    red *= d
        else:
            m = _CONTRACT_RE.search(stripped)
            if m is None:
                continue
            red = 1
            for i in (int(x) for x in m.group(1).split(",")):
                red *= lhs_dims[i]
        key = lhs_prim if lhs_prim == rhs_prim else f"{lhs_prim}x{rhs_prim}"
        out[key] = out.get(key, 0) + 2 * out_elems * red
    return out


def compiled_flops_by_dtype(compiled) -> dict:
    return hlo_flops_by_dtype(compiled.as_text())
