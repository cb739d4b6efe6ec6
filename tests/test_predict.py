"""The predict CLI end-to-end: committed weight snapshot → denoised PNG
with a PSNR gain under the benchmark protocol (the reference's
README.ipynb cell-12 demo as a command)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from irdu_tpu.data.synthetic import make_synthetic_image
from irdu_tpu.predict import default_weights, main

pytestmark = pytest.mark.skipif(
    default_weights("micro") is None,
    reason="no committed micro weight snapshot")


def test_predict_cli_denoises(tmp_path, capsys):
    img = make_synthetic_image(np.random.RandomState(7), 64, 80)
    src = tmp_path / "clean.png"
    dst = tmp_path / "out.png"
    Image.fromarray(img).save(src)

    main(["--input", str(src), "--output", str(dst),
          "--model", "micro", "--sigma", "25"])

    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(dst)
    assert report["psnr_denoised"] > report["psnr_noisy"] + 3.0
    out = np.asarray(Image.open(dst))
    assert out.shape == img.shape
