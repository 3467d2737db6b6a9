"""End-to-end pipeline: train -> record -> checkpoint -> resume -> dump -> evaluate."""

import argparse
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

# full tier only: big-model / parity / e2e (see pytest.ini)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    for split in ("Train", "Test"):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
        for i in range(4):
            w, h = 50 + i, 44 + i
            mask = np.zeros((h, w), np.uint8)
            mask[10:30, 8:35] = 255
            img = np.clip(np.stack([mask] * 3, -1) + rng.integers(0, 60, (h, w, 3)), 0, 255)
            Image.fromarray(img.astype(np.uint8), "RGB").save(root / split / "image" / f"i{i}.png")
            Image.fromarray(mask, "L").save(root / split / "mask" / f"i{i}.png")
    return str(root)


def _tiny_model(**kw):
    from tramba_tpu.models.tramba import TrambaV

    return TrambaV(img_size=32, dims=8, enc_depths=(1, 1), dec_depths=(1, 1),
                   ssm_backend="assoc", **kw)


def _args(tmp, data_root, **over):
    d = dict(
        method="Tramba-V-TSOD", data_root=data_root, evaluation_root=data_root,
        img_size=32, batch_size=2, lr=1e-4, train_epochs=2, decay_epochs="1",
        decay_factors="0.2", see=1, save_model=os.path.join(tmp, "results"),
        tf_log_path=None, resume=None, best_MAE=None, pretrained_path=None,
    )
    d.update(over)
    return argparse.Namespace(**d)


def test_train_eval_record_resume(tiny_dataset, tmp_path, monkeypatch):
    from tramba_tpu.models import registry
    from tramba_tpu.train import loop

    monkeypatch.setattr(registry, "build", lambda *a, **k: _tiny_model())
    monkeypatch.setattr(loop, "build", lambda *a, **k: _tiny_model())

    args = _args(str(tmp_path), tiny_dataset)
    state = loop.training(args)
    assert int(state.step) == 2 * 2  # 2 epochs x 2 batches

    record = os.path.join(args.save_model, "Record_Tramba-V-TSOD.txt")
    assert os.path.exists(record)
    txt = open(record).read()
    assert "MAE" in txt and "Smeasure" in txt

    resume_dir = os.path.join(args.save_model, "Tramba-V-TSOD")
    assert any("MAE" in f for f in os.listdir(resume_dir))  # best ckpt saved

    # resume from the rolling checkpoint and continue one epoch
    args2 = _args(str(tmp_path), tiny_dataset, resume="last", train_epochs=3)
    # epoch 2 % 5 != 0 so no rolling resume yet at train_epochs=2; write one
    from tramba_tpu.train import checkpoint as ckpt

    ckpt.save_resume(os.path.join(resume_dir, "Tramba-V-TSOD_resume"), state, epoch=1)
    state2 = loop.training(args2)
    assert int(state2.step) == int(state.step) + 2  # one more epoch of 2 batches


def test_dump_and_evaluate(tiny_dataset, tmp_path):
    from tramba_tpu.eval.dump import dump_saliency_maps, evaluate_maps, format_results_row

    model = _tiny_model()
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    save_path = str(tmp_path / "maps")
    n = dump_saliency_maps(model, variables, tiny_dataset, save_path, img_size=32, batch_size=2)
    assert n == 4
    dumped = os.listdir(save_path)
    assert len(dumped) == 4
    im = Image.open(os.path.join(save_path, dumped[0]))
    assert im.size == (50, 44) or im.size[0] >= 50  # original resolution restored

    r = evaluate_maps(save_path, os.path.join(tiny_dataset, "Test", "mask"),
                      save_pr_dir=str(tmp_path))
    assert r["count"] == 4
    assert 0 <= r["MAE"] <= 1 and 0 <= r["Smeasure"] <= 1
    assert os.path.exists(tmp_path / "precision.npy")
    row = format_results_row("tiny", "TSOD", r)
    assert "tiny" in row and "&" in row
