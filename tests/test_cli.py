"""CLI driver tests (in-process, small images, CPU)."""
import os

import numpy as np
import pytest
from PIL import Image

from fractencode_tpu.cli import main


@pytest.fixture()
def small_png(tmp_path, lenna_y):
    path = tmp_path / "small.png"
    Image.fromarray(np.asarray(lenna_y)[:64, :64], mode="L").save(path)
    return str(path)


def _run(args, tmp_path):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        return main(args)
    finally:
        os.chdir(cwd)


def test_encode_decode_roundtrip(small_png, tmp_path, capsys):
    rc = _run([small_png, "--result", str(tmp_path / "out.png"),
               "--out", str(tmp_path / "c.ftc")], tmp_path)
    assert rc == 0
    out = capsys.readouterr().out
    assert "encoded in" in out and "psnr:" in out and "bitstream:" in out
    assert (tmp_path / "out.png").exists()
    assert (tmp_path / "c.ftc").exists()

    rc = _run(["--decode-file", str(tmp_path / "c.ftc"),
               "--result", str(tmp_path / "dec.png")], tmp_path)
    assert rc == 0
    assert (tmp_path / "dec.png").exists()
    dec = np.asarray(Image.open(tmp_path / "dec.png"))
    assert dec.shape == (64, 64)


def test_quadtree_flag(small_png, tmp_path, capsys):
    rc = _run([small_png, "--quadtree", "--qt-threshold", "40",
               "--result", str(tmp_path / "q.png"),
               "--out", str(tmp_path / "q.ftc")], tmp_path)
    assert rc == 0
    out = capsys.readouterr().out
    assert "leaves" in out
    # quadtree stream decodes through the same entry point (FTQ1 magic)
    rc = _run(["--decode-file", str(tmp_path / "q.ftc"),
               "--result", str(tmp_path / "qdec.png")], tmp_path)
    assert rc == 0
    assert (tmp_path / "qdec.png").exists()


def test_compat_flag(small_png, tmp_path, capsys):
    rc = _run([small_png, "--compat", "--result", str(tmp_path / "c.png")], tmp_path)
    assert rc == 0
    assert "psnr:" in capsys.readouterr().out


def test_invalid_sizes(small_png, tmp_path, capsys):
    rc = _run([small_png, "--source", "4", "--target", "8"], tmp_path)
    assert rc == 2
    assert "invalid source" in capsys.readouterr().err


def test_garbage_bitstream(tmp_path, capsys):
    bad = tmp_path / "bad.ftc"
    bad.write_bytes(b"garbage")
    rc = _run(["--decode-file", str(bad)], tmp_path)
    assert rc == 2
    assert "not a valid bitstream" in capsys.readouterr().err


def test_no_input(tmp_path, capsys):
    rc = _run([], tmp_path)
    assert rc == 2