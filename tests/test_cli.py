"""CLI surface tests (zkp_subnet_tpu/__main__.py): setup + check.

`round`/`aggregate`/`run`/`serve` are driven end-to-end by the verify
workflow and the runtime/server tests; here the artifact tooling gets
in-tree coverage: manifest writing, cryptographic SRS validation, and
corruption detection (the fetch/verify story of SURVEY.md §2.12)."""

import os

from zkp_subnet_tpu.__main__ import main


def test_setup_check_and_corruption(tmp_path):
    setup = str(tmp_path / "setup_4_1.npz")
    pre = str(tmp_path / "precompute_4_1.npz")
    argv = ["setup", "--setup-path", setup, "--precompute-path", pre,
            "--scale", "4", "--machines-scale", "1",
            "--generate-setup", "--generate-precompute"]
    assert main(argv) == 0
    assert os.path.exists(setup + ".sha256")

    # refuses to overwrite without --overwrite
    assert main(argv) == 1
    assert main(argv + ["--overwrite"]) == 0

    check = ["check", "--setup-path", setup, "--precompute-path", pre]
    assert main(check) == 0

    # flip one byte in the precompute → manifest check must fail
    raw = bytearray(open(pre, "rb").read())
    raw[-1] ^= 0xFF
    open(pre, "wb").write(bytes(raw))
    assert main(check) == 1
