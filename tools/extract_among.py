"""Recover snowball among() tables from the compiled libstemmer .so.

The goldens technique (tools/gen_snowball_goldens.py) treats the
compiled library as the behavioral oracle; this tool reads the same
library's DATA to see the oracle's suffix tables directly instead of
rediscovering them by probing.  The snowball compiler emits each
among() as an array of

    struct among { int s_size; const symbol *s; int substring_i;
                   int result; int (*function)(struct SN_env*); };

(32 bytes on x86-64).  In the PIC .so the two pointer slots are zero
in the file image and filled by R_X86_64_RELATIVE relocations whose
addend is the target vaddr, so:

  - walk .rela.dyn, index addend-by-offset;
  - scan .data.rel.ro for maximal runs of records where slot+8 has a
    relocation into .rodata, s_size is plausible (1..64), and the
    bytes at the string's vaddr (== file offset here) decode as UTF-8
    of a known script;
  - print each array with entry index, string, substring_i, result,
    and whether a guard function is attached.

The routine control flow stays in .text (not recovered); that comes
from the published algorithm descriptions + differential probing
(tools/probe_stemmer.py).  Usage:

    python tools/extract_among.py [--script devanagari|cyrillic|greek|
                                    arabic|armenian|hebrew|tamil|latin|any]
"""

from __future__ import annotations

import argparse
import struct
import sys

LIB = "/usr/lib/x86_64-linux-gnu/libstemmer.so.0d.0.0"

SCRIPT_RANGES = {
    "latin": [(0x20, 0x17F), (0x200, 0x24F)],
    "devanagari": [(0x900, 0x97F)],
    "cyrillic": [(0x400, 0x4FF)],
    "greek": [(0x370, 0x3FF)],
    "arabic": [(0x600, 0x6FF), (0x750, 0x77F)],
    "armenian": [(0x530, 0x58F)],
    "hebrew": [(0x590, 0x5FF)],
    "tamil": [(0xB80, 0xBFF)],
}


def load_elf(path: str):
    data = open(path, "rb").read()
    assert data[:4] == b"\x7fELF" and data[4] == 2  # 64-bit
    e_shoff = struct.unpack_from("<Q", data, 0x28)[0]
    e_shentsize = struct.unpack_from("<H", data, 0x3A)[0]
    e_shnum = struct.unpack_from("<H", data, 0x3C)[0]
    e_shstrndx = struct.unpack_from("<H", data, 0x3E)[0]
    secs = []
    for i in range(e_shnum):
        off = e_shoff + i * e_shentsize
        name, stype, flags, addr, offset, size, link, info, align, entsize = (
            struct.unpack_from("<IIQQQQIIQQ", data, off)
        )
        secs.append(dict(name=name, type=stype, addr=addr, offset=offset,
                         size=size, entsize=entsize))
    strtab = secs[e_shstrndx]
    for s in secs:
        end = data.index(b"\0", strtab["offset"] + s["name"])
        s["sname"] = data[strtab["offset"] + s["name"]:end].decode()
    return data, {s["sname"]: s for s in secs}


def relative_relocs(data, secs):
    """offset -> addend for R_X86_64_RELATIVE (type 8)."""
    out = {}
    for name in (".rela.dyn", ".rela.plt"):
        s = secs.get(name)
        if not s:
            continue
        for off in range(s["offset"], s["offset"] + s["size"], 24):
            r_offset, r_info, r_addend = struct.unpack_from("<QQq", data, off)
            if r_info & 0xFFFFFFFF == 8:
                out[r_offset] = r_addend
    return out


def in_section(secs, name, vaddr):
    s = secs[name]
    return s["addr"] <= vaddr < s["addr"] + s["size"]


def vread(data, secs, vaddr, n):
    # file offset == vaddr for these PROGBITS sections (verified layout)
    for s in secs.values():
        if s["addr"] <= vaddr < s["addr"] + s["size"] and s["type"] == 1:
            return data[s["offset"] + (vaddr - s["addr"]):
                        s["offset"] + (vaddr - s["addr"]) + n]
    return b""


def script_ok(text: str, ranges) -> bool:
    return all(any(lo <= ord(c) <= hi for lo, hi in rs)
               for c in text for rs in [ranges])


def extract(script: str = "any"):
    data, secs = load_elf(LIB)
    relocs = relative_relocs(data, secs)
    drr = secs[".data.rel.ro"]
    records = []  # (vaddr, s_size, str_vaddr, substring_i, result, has_fn)
    for va in range(drr["addr"], drr["addr"] + drr["size"] - 32, 8):
        foff = drr["offset"] + (va - drr["addr"])
        s_size = struct.unpack_from("<i", data, foff)[0]
        if not (1 <= s_size <= 64):
            continue
        sp = relocs.get(va + 8)
        if sp is None or not in_section(secs, ".rodata", sp):
            continue
        substring_i, result = struct.unpack_from("<ii", data, foff + 16)
        if not (-1 <= substring_i <= 4096 and -1 <= result <= 4096):
            continue
        fn = relocs.get(va + 24)
        fnraw = struct.unpack_from("<Q", data, foff + 24)[0]
        if fn is None and fnraw != 0:
            continue
        raw = vread(data, secs, sp, s_size)
        try:
            txt = raw.decode("utf-8")
        except UnicodeDecodeError:
            continue
        records.append((va, s_size, txt, substring_i, result,
                        fn is not None))

    # group maximal runs of consecutive records (32-byte stride)
    arrays, cur = [], []
    for rec in records:
        if cur and rec[0] != cur[-1][0] + 32:
            arrays.append(cur)
            cur = []
        cur.append(rec)
    if cur:
        arrays.append(cur)

    ranges = SCRIPT_RANGES.get(script)
    for arr in arrays:
        if len(arr) < 2:
            continue
        if ranges is not None and not any(
            script_ok(r[2], ranges) for r in arr
        ):
            continue
        print(f"=== among @ {arr[0][0]:#x} ({len(arr)} entries) ===")
        for i, (va, sz, txt, sub_i, res, has_fn) in enumerate(arr):
            g = " GUARD" if has_fn else ""
            print(f"  [{i:3d}] {txt!r:30s} sub_i={sub_i:3d} "
                  f"result={res}{g}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--script", default="any",
                    choices=["any"] + sorted(SCRIPT_RANGES))
    args = ap.parse_args()
    extract(args.script)
