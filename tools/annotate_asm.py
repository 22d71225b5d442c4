"""Annotate a libstemmer disassembly range into pseudo-snowball.

Companion to tools/extract_among.py (which recovers among() DATA):
this resolves the CODE side — for every call to a snowball runtime
helper inside [--start, --end) it reconstructs the argument registers
from the preceding instruction stream and prints one line per call:

    find_among_b(table=0x82340, n=4)        + the table's entries
    slice_from('ι')                          (esi=size, rdx→.rodata)
    eq_s_b('ισα')
    in_grouping_b(g=0x..., min=945, max=969)

plus the raw cmp/test/jcc skeleton between calls so the result-switch
and guard structure (atlimit = cmp c,lb; test1 flags; mark compares)
stays visible.  Register tracking is a simple last-write scan per
basic-block-ish window — good enough because the generated code
materializes helper args immediately before each call.

Used for the greek/serbian/arabic ports (the three biggest snowball
sources); the hand-decoded languages of earlier rounds used raw
objdump reading (see tools/NOTES_snowball_remaining.md).

Usage:
    objdump -d /usr/lib/x86_64-linux-gnu/libstemmer.so.0d.0.0 \
        > /tmp/libstemmer.asm   # once
    python tools/annotate_asm.py --start 0x46d00 --end 0x49300
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from tools.extract_among import load_elf, relative_relocs, vread, LIB  # noqa: E402

HELPERS = {
    0x40ed0: "find_among_b", 0x40d50: "find_among",
    0x41250: "slice_del", 0x41200: "slice_from", 0x41260: "insert_s",
    0x40cd0: "eq_s_b", 0x40c80: "eq_s",
    0x40850: "in_grouping_b", 0x40690: "in_grouping_b2",
    0x40710: "skip_b", 0x413f0: "len_utf8",
    0x409e0: "out_grouping_b", 0x40920: "in_grouping", 0x40780: "out_grouping",
}

ASM_LINE = re.compile(r"^\s*([0-9a-f]+):\t(?:[0-9a-f]{2} )+\s*\t?(.*)$")


def parse_args_():
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=lambda s: int(s, 0), required=True)
    ap.add_argument("--end", type=lambda s: int(s, 0), required=True)
    ap.add_argument("--asm", default="/tmp/libstemmer.asm")
    ap.add_argument("--raw", action="store_true",
                    help="also echo every raw instruction")
    return ap.parse_args()


def main() -> None:
    args = parse_args_()
    data, secs = load_elf(LIB)
    _ = relative_relocs(data, secs)

    regs: dict[str, tuple[str, int]] = {}  # reg -> ("imm"/"addr", value)
    WIDE = {"rdi": "di", "rsi": "si", "rdx": "dx", "rcx": "cx",
            "r8": "r8d", "r9": "r9d", "rax": "ax", "rbx": "bx",
            "r12": "r12d", "r13": "r13d", "r14": "r14d", "r15": "r15d",
            "rbp": "bp"}

    def canon(r: str) -> str:
        r = r.strip("%")
        for wide, low in WIDE.items():
            if r in (wide, "e" + low if not low.startswith("r") else low,
                     low):
                return wide
        return r

    def fetch_str(reg: str, nreg: str):
        a = regs.get(canon(reg))
        n = regs.get(canon(nreg))
        if a and a[0] == "addr" and n and n[0] == "imm" and 0 < n[1] <= 64:
            raw = vread(data, secs, a[1], n[1])
            try:
                return raw.decode("utf-8")
            except UnicodeDecodeError:
                return raw.hex()
        return None

    ZOFF = {0x8: "c", 0xc: "l", 0x10: "lb", 0x14: "bra", 0x18: "ket"}

    for line in open(args.asm):
        m = ASM_LINE.match(line)
        if not m:
            continue
        addr = int(m.group(1), 16)
        if addr < args.start:
            continue
        if addr >= args.end:
            break
        insn = m.group(2).strip()
        out = None

        mm = re.match(r"lea\s+0x[0-9a-f]+\(%rip\),(%\w+)\s+#\s*([0-9a-f]+)",
                      insn)
        if mm:
            regs[canon(mm.group(1))] = ("addr", int(mm.group(2), 16))
        mm = re.match(r"mov\s+\$(0x[0-9a-f]+|\d+),(%\w+)", insn)
        if mm:
            regs[canon(mm.group(2))] = ("imm", int(mm.group(1), 0))
        mm = re.match(r"mov\s+(%\w+),(%\w+)$", insn)
        if mm:
            src = regs.get(canon(mm.group(1)))
            if src:
                regs[canon(mm.group(2))] = src
            else:
                regs.pop(canon(mm.group(2)), None)

        mm = re.match(r"call\s+([0-9a-f]+)", insn)
        if mm:
            target = int(mm.group(1), 16)
            name = HELPERS.get(target, f"fn_{target:x}")
            if name in ("find_among_b", "find_among"):
                t = regs.get("rsi")
                n = regs.get("rdx")
                ts = f"{t[1]:#x}" if t and t[0] == "addr" else "?"
                ns = str(n[1]) if n and n[0] == "imm" else "?"
                out = f"{name}(table={ts}, n={ns})"
            elif name in ("slice_from", "eq_s_b", "eq_s"):
                s = fetch_str("rdx", "rsi")
                out = f"{name}({s!r})"
            elif name == "insert_s":
                s = fetch_str("r8", "rcx")
                out = f"{name}({s!r})"
            elif name in ("in_grouping_b", "in_grouping",
                          "out_grouping_b", "out_grouping",
                          "in_grouping_b2"):
                g = regs.get("rsi")
                mn = regs.get("rdx")
                mx = regs.get("rcx")
                gs = f"{g[1]:#x}" if g and g[0] == "addr" else "?"
                out = (f"{name}(g={gs}, "
                       f"min={mn[1] if mn and mn[0]=='imm' else '?'}, "
                       f"max={mx[1] if mx and mx[0]=='imm' else '?'})")
            elif name == "skip_b":
                n = regs.get("rsi") or regs.get("rdx")
                out = f"{name}(n={n[1] if n and n[0]=='imm' else '?'})"
            else:
                out = f"{name}()"
            regs.pop("rax", None)
        elif insn.startswith(("cmp", "test", "j", "set")):
            sk = insn
            for off, nm in ZOFF.items():
                sk = sk.replace(f"{off:#x}(%", f"z.{nm}(%")
            out = f"    {sk}"
        elif re.match(r"mov[lq]?\s+.*0x(8|c|10|14|18)\(%r", insn) or \
                re.match(r"mov[lq]?\s+0x(8|c|10|14|18)\(%r", insn):
            sk = insn
            for off, nm in ZOFF.items():
                sk = re.sub(rf"\b{off:#x}\(%", f"z.{nm}(%", sk)
            out = f"    {sk}"

        if args.raw and out is None:
            out = f"        {insn}"
        if out:
            print(f"{addr:#x}  {out}")


if __name__ == "__main__":
    main()
