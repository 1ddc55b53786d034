"""Convert public alist code definitions into packaged npz assets.

The reference ships seven public parity-check matrices as alist data files
(SURVEY.md §2 "Code assets": CCSDS (128,64), two (121,·) array codes, a
(96,48) QC code, a (64,32) code, WiMAX (1056,880), and a WiMAX-like
(384,192)).  These are standard public code *definitions* (data, not code);
this script parses them with our alist reader, validates the generator
construction (H @ G.T == 0), and stores the parity-check matrix in
compressed npz form under ``short_ldpc_decoding_osd_tpu/data/`` for the
registry (the same treatment the CCSDS matrix got in round 1).

Usage: python scripts/import_reference_codes.py <alist-or-txt> <npz-name> ...
or with no args, convert the standard set from /root/reference if mounted.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from short_ldpc_decoding_osd_tpu.codes import Code, gf2  # noqa: E402
from short_ldpc_decoding_osd_tpu.codes.code import _DATA_DIR  # noqa: E402

_REF = "/root/reference/LDPC_128"
_STANDARD_SET = [
    (f"{_REF}/Training_data_gen_128/ArrayCode_N121_K60_r0.50.alist", "array_121_60"),
    (f"{_REF}/Training_data_gen_128/ArrayCode_N121_K80_r0.66.alist", "array_121_80"),
    (f"{_REF}/Ldpc_128_training/LDPC_N96_K48_P8_set0_dmin10.alist", "qc_96_48"),
    (f"{_REF}/Ldpc_128_training/code1.alist", "code1_64_32"),
    (f"{_REF}/Ldpc_128_training/wimax_1056_0.83.alist", "wimax_1056_880"),
    (f"{_REF}/DL_Training_serial/wimaxlike_N384_K192_P16_set0.txt", "wimaxlike_384_192"),
]


def import_one(path: str, name: str) -> None:
    code = Code.from_alist(path, name)
    r = gf2.rank(code.h)
    out = os.path.join(_DATA_DIR, name + ".npz")
    np.savez_compressed(out, h=code.h.astype(np.uint8))
    print(
        f"{name}: n={code.n} m={code.m} rank={r} k={code.k} "
        f"dv<={code.max_var_degree} dc<={code.max_chk_degree} -> {out}"
    )


def main(argv: list[str]) -> None:
    pairs = (
        list(zip(argv[::2], argv[1::2]))
        if argv
        else [(p, n) for p, n in _STANDARD_SET if os.path.exists(p)]
    )
    for path, name in pairs:
        import_one(path, name)


if __name__ == "__main__":
    main(sys.argv[1:])
