"""Write-traffic census of a dumped optimized HLO module (r4 protocol,
re-runnable): sums output bytes of every top-level scheduled instruction in
the entry computation, bucketed by op kind, and prints the largest
individual writers. Usage:

    python tools/prof/dump_hlo_batch.py 1        # writes /tmp/hlo_b1.txt
    python tools/prof/traffic_count.py /tmp/hlo_b1.txt

"Writes" = bytes materialized by fusions / copies / convs / custom-calls /
other non-trivial ops; reads are not counted (cost-analysis 'bytes
accessed' bounds those). Tuple-shaped outputs count every leaf.
"""
import re
import sys
from collections import defaultdict

DT_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
            "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
            "pred": 1, "token": 0, "f8e4m3fn": 1, "f8e5m2": 1,
            "s4": 1, "u4": 1}

SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")


def shape_bytes(sig):
    """Total bytes over every array leaf in an HLO shape signature string
    (handles tuples by summing all array shapes present)."""
    total = 0
    for dt, dims in SHAPE_RE.findall(sig):
        if dt not in DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def classify(rhs):
    m = re.match(r"\s*(?:\w+\s*=\s*)?(?:\([^)]*\)|\S+)\s+(\w[\w-]*)\(", rhs)
    op = m.group(1) if m else "?"
    if op == "fusion":
        return "fusion"
    if op in ("copy", "copy-start", "copy-done", "transpose", "bitcast"):
        return "copy/transpose" if op != "bitcast" else None
    if op.startswith("conv"):
        return "conv"
    if op == "custom-call":
        return "custom-call"
    if op in ("parameter", "constant", "get-tuple-element", "tuple",
              "bitcast"):
        return None
    return "other"


def main(path):
    ent = []
    in_entry = False
    for line in open(path):
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            ent.append(line)

    by_kind = defaultdict(float)
    writers = []
    for line in ent:
        if "=" not in line:
            continue
        name, rhs = line.split("=", 1)
        kind = classify(rhs)
        if kind is None:
            continue
        # copy-done materializes what copy-start declared; avoid counting
        # the async pair twice (count the -done, skip the -start)
        if "copy-start(" in rhs:
            continue
        b = shape_bytes(rhs.split("(", 1)[0])
        by_kind[kind] += b
        writers.append((b, name.strip(), rhs.strip()[:110]))

    total = sum(by_kind.values())
    print(f"{path}: {len(ent)} entry lines, write traffic "
          f"{total / 1e9:.2f} GB")
    for k, v in sorted(by_kind.items(), key=lambda kv: -kv[1]):
        print(f"  {k:15s} {v / 1e9:6.2f} GB")
    print("top writers:")
    for b, name, rhs in sorted(writers, reverse=True)[:25]:
        print(f"  {b / 1e6:8.1f} MB  {name:24s} {rhs}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/hlo_b1.txt")
