"""CLI surface tests: drive sdtpu.cli.main(argv) in-process (the analogue of
the reference's test apps, reference: test/simple_app.cpp:6-38)."""

import numpy as np
import pytest
from PIL import Image

from sdtpu.cli import main


@pytest.fixture()
def init_png(tmp_path):
    row = np.linspace(0, 255, 16, dtype=np.uint8)
    img = np.ascontiguousarray(
        np.broadcast_to(row[None, :, None], (16, 16, 3)))
    p = tmp_path / "init.png"
    Image.fromarray(img).save(p)
    return p


def test_info_runs(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "sdtpu" in out and "config sd15" in out


def test_generate_png_and_bin_roundtrip(tmp_path, capsys):
    png = tmp_path / "out.png"
    args = ["generate", "--config", "tiny", "--steps", "2", "--seed", "3",
            "--prompt", "the horse"]
    assert main(args + ["--out", str(png)]) == 0
    a = np.asarray(Image.open(png))
    assert a.shape == (16, 16, 3) and a.dtype == np.uint8

    # raw .bin output + `show` conversion (reference output.bin protocol)
    bin_path = tmp_path / "out.bin"
    assert main(args + ["--out", str(bin_path)]) == 0
    raw = np.fromfile(bin_path, np.uint8).reshape(16, 16, 3)
    assert np.array_equal(raw, a)  # same seed -> same image, both formats
    assert main(["show", str(bin_path)]) == 0
    shown = np.asarray(Image.open(tmp_path / "out.png"))
    assert np.array_equal(shown, raw)


def test_generate_img2img_and_inpaint_flags(tmp_path, init_png):
    out = tmp_path / "i.png"
    base = ["generate", "--config", "tiny", "--steps", "2", "--seed", "1",
            "--init-image", str(init_png), "--out", str(out)]
    assert main(base + ["--strength", "0.5"]) == 0
    assert np.asarray(Image.open(out)).shape == (16, 16, 3)

    mask = np.zeros((16, 16), np.uint8)
    mask[:, 8:] = 255
    mask_path = init_png.parent / "mask.png"
    Image.fromarray(mask, "L").save(mask_path)
    assert main(base + ["--mask-image", str(mask_path)]) == 0
    assert np.asarray(Image.open(out)).shape == (16, 16, 3)


def test_bad_sampler_rejected():
    with pytest.raises(SystemExit):
        main(["generate", "--config", "tiny", "--sampler", "nope"])


def test_train_and_resume(tmp_path, capsys):
    """`sdtpu train`: demo-data fine-tune writes a resumable orbax state;
    `--resume` continues from the saved step counter."""
    out1 = tmp_path / "ck1"
    assert main(["train", "--config", "tiny", "--steps", "3", "--batch", "2",
                 "--ema", "--log-every", "1", "--out", str(out1),
                 "--platform", "cpu"]) == 0
    captured = capsys.readouterr().out
    assert "loss" in captured and "saved train state (step 3, ema)" in captured

    out2 = tmp_path / "ck2"
    assert main(["train", "--config", "tiny", "--steps", "2", "--batch", "2",
                 "--ema", "--resume", str(out1), "--out", str(out2),
                 "--platform", "cpu"]) == 0
    captured = capsys.readouterr().out
    assert "resumed at step 3" in captured
    assert "saved train state (step 5, ema)" in captured
