"""Derive the BC7 partition / anchor-index tables empirically.

The BC7 format's 64-entry partition tables (2- and 3-subset) and anchor
index tables are public constants from the Khronos/D3D spec. Rather than
transcribing them by hand (error-prone), this script recovers them by
probing Pillow's native BC7 decoder with crafted blocks:

* Partition tables: encode a block in mode 1 (2 subsets) / mode 2
  (3 subsets) whose subsets have distinct endpoint colors and all-zero
  indices; the decoded pixel colors reveal each pixel's subset.
* Anchor tables: with endpoints e0=black / e1=white and 1-bit index probes,
  the per-pixel index bit widths (anchors have one fewer bit) fall out of
  which pixel each set bit lands in.

Output: tpurast/assets/_bc7_tables.py (regenerate with
``python tools/derive_bc7_tables.py``).

Run-once developer tool; the committed tables are what ships.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


class BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def block(self) -> bytes:
        assert len(self.bits) == 128, len(self.bits)
        out = bytearray(16)
        for i, b in enumerate(self.bits):
            out[i // 8] |= b << (i % 8)
        return bytes(out)


def decode_bc7(block: bytes) -> np.ndarray:
    im = Image.frombytes("RGBA", (4, 4), block, "bcn", (7, ""))
    return np.asarray(im)


def mode1_block(partition: int, index_bits: list[int] | None = None) -> bytes:
    """Mode 1: 2 subsets, 6 partition bits, RGB 6.6.6, shared p-bit per
    subset, 3-bit indices. Subset0 = black, subset1 = white."""
    w = BitWriter()
    w.put(0b10, 2)  # mode 1 marker (one zero, then 1)
    w.put(partition, 6)
    # R endpoints: s0e0, s0e1, s1e0, s1e1 then G then B, 6 bits each.
    # e0 black/white identifies the subset (indices all 0 -> e0); e1 differs
    # from e0 so index-bit probes are visible in both subsets.
    for _chan in range(3):
        w.put(0, 6)
        w.put(63, 6)
        w.put(63, 6)
        w.put(0, 6)
    w.put(0b10, 2)  # shared p-bits: subset0 -> 0, subset1 -> 1
    idx = index_bits or [0] * (16 * 3 - 2)
    for b in idx:
        w.put(b, 1)
    return w.block()


def mode2_block(partition: int, index_bits: list[int] | None = None) -> bytes:
    """Mode 2: 3 subsets, 6 partition bits, RGB 5.5.5, no p-bits, 2-bit
    indices. Subset colors: s0 black, s1 red, s2 green."""
    w = BitWriter()
    w.put(0b100, 3)  # mode 2 marker
    w.put(partition, 6)
    subset_e0 = [(0, 0, 0), (31, 0, 0), (0, 31, 0)]
    subset_e1 = [(0, 0, 31), (31, 31, 0), (0, 31, 31)]  # differ from e0
    for chan in range(3):
        for subset in range(3):
            w.put(subset_e0[subset][chan], 5)
            w.put(subset_e1[subset][chan], 5)
    idx = index_bits or [0] * (16 * 2 - 3)
    for b in idx:
        w.put(b, 1)
    return w.block()


def derive_partitions_2() -> np.ndarray:
    table = np.zeros((64, 16), dtype=np.int64)
    for p in range(64):
        px = decode_bc7(mode1_block(p)).reshape(16, 4)
        table[p] = (px[:, 0] > 128).astype(np.int64)
    return table


def derive_partitions_3() -> np.ndarray:
    table = np.zeros((64, 16), dtype=np.int64)
    for p in range(64):
        px = decode_bc7(mode2_block(p)).reshape(16, 4)
        subset = np.where(px[:, 0] > 128, 1, np.where(px[:, 1] > 128, 2, 0))
        table[p] = subset
    return table


def _pixel_bit_widths(make_block, total_index_bits: int, baseline: np.ndarray) -> np.ndarray:
    """For each index-stream bit, find which pixel it feeds; pixel bit
    widths fall out as counts."""
    widths = np.zeros(16, dtype=np.int64)
    for b in range(total_index_bits):
        bits = [0] * total_index_bits
        bits[b] = 1
        px = decode_bc7(make_block(bits)).reshape(16, 4)
        changed = np.nonzero(np.any(px != baseline, axis=1))[0]
        assert len(changed) == 1, (b, changed)
        widths[changed[0]] += 1
    return widths


def derive_anchors_2(partitions_2: np.ndarray) -> np.ndarray:
    anchors = np.zeros(64, dtype=np.int64)
    for p in range(64):
        baseline = decode_bc7(mode1_block(p)).reshape(16, 4)
        widths = _pixel_bit_widths(lambda bits: mode1_block(p, bits), 46, baseline)
        short = np.nonzero(widths == 2)[0]
        assert len(short) == 2 and 0 in short, (p, widths)
        anchor = [s for s in short if s != 0]
        # Anchor of subset 1 (pixel 0 is always subset 0's anchor).
        assert partitions_2[p][anchor[0]] == 1, (p, anchor)
        anchors[p] = anchor[0]
    return anchors


def derive_anchors_3(partitions_3: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    anchors_second = np.zeros(64, dtype=np.int64)
    anchors_third = np.zeros(64, dtype=np.int64)
    for p in range(64):
        baseline = decode_bc7(mode2_block(p)).reshape(16, 4)
        widths = _pixel_bit_widths(lambda bits: mode2_block(p, bits), 29, baseline)
        short = np.nonzero(widths == 1)[0]
        assert len(short) == 3 and 0 in short, (p, widths)
        others = [s for s in short if s != 0]
        subsets = [partitions_3[p][s] for s in others]
        assert sorted(subsets) == [1, 2], (p, others, subsets)
        for s, subset in zip(others, subsets):
            if subset == 1:
                anchors_second[p] = s
            else:
                anchors_third[p] = s
    return anchors_second, anchors_third


def fmt_table(name: str, arr: np.ndarray) -> str:
    if arr.ndim == 1:
        body = ",\n    ".join(
            ", ".join(str(v) for v in arr[i : i + 16]) for i in range(0, len(arr), 16)
        )
        return f"{name} = np.array([\n    {body},\n], dtype=np.int32)\n"
    rows = ",\n    ".join("(" + ", ".join(str(v) for v in row) + ")" for row in arr)
    return f"{name} = np.array([\n    {rows},\n], dtype=np.int32)\n"


def main() -> None:
    p2 = derive_partitions_2()
    p3 = derive_partitions_3()
    a2 = derive_anchors_2(p2)
    a3_second, a3_third = derive_anchors_3(p3)

    out = [
        '"""BC7 partition / anchor tables (spec constants).\n',
        "Recovered empirically from a known-good decoder by",
        "tools/derive_bc7_tables.py; do not edit by hand.\n",
        'Shared by BC7 (all tables) and BC6H (first 32 rows of the 2-subset',
        'tables).\n"""\n',
        "import numpy as np\n",
        fmt_table("PARTITIONS_2", p2),
        fmt_table("PARTITIONS_3", p3),
        fmt_table("ANCHOR_SECOND_2", a2),
        fmt_table("ANCHOR_SECOND_3", a3_second),
        fmt_table("ANCHOR_THIRD_3", a3_third),
    ]
    path = "tpurast/assets/_bc7_tables.py"
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    print("partitions_2[0]:", p2[0])
    print("anchors_2[:8]:", a2[:8])


if __name__ == "__main__":
    main()
