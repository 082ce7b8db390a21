"""Tests for config, registry, crc32c/TB writer, checkpoint, metric math."""

import json
import os
import struct
import zlib

import numpy as np
import pytest

from iprgan_tpu.config import Config
from iprgan_tpu.registry import Registry
from iprgan_tpu.utils import checkpoint
from iprgan_tpu.utils.crc32c import crc32c, masked_crc32c
from iprgan_tpu.utils.metrics_math import (
    calculate_frechet_distance,
    calculate_inception_score,
)
from iprgan_tpu.utils.tb_writer import EventFileWriter, make_grid


def test_config_roundtrip(tmp_path):
    raw = {
        "dataset": {"name": "cifar10", "size": 32},
        "hparam": {"bsz": 64, "iteration": 100},
        "protection": {"bbox": {"lambda": 1.0, "loss_fn": "ssim"}},
        "seed": 1234,
    }
    p = tmp_path / "c.yaml"
    import yaml

    p.write_text(yaml.safe_dump(raw))
    cfg = Config.parse(str(p))

    assert cfg.dataset.name == "cifar10"
    assert cfg.hparam.bsz == 64
    assert cfg.protection.bbox["lambda"] == 1.0
    assert cfg.get("missing", 7) == 7
    assert cfg.to_dict() == raw

    # mutation + item access (attack scripts rely on this)
    cfg.hparam.iteration //= 2
    cfg["attack_mode"] = "FINETUNE"
    assert cfg.to_dict()["hparam"]["iteration"] == 50
    assert cfg.attack_mode == "FINETUNE"

    # nested dict assignment becomes a Config
    cfg.evaluation = {"p_thres": 0.01}
    assert cfg.evaluation.p_thres == 0.01

    # deep copy is independent
    cp = cfg.copy()
    cp.hparam.bsz = 1
    assert cfg.hparam.bsz == 64

    # yaml round trip
    cfg2 = Config(yaml.safe_load(cfg.to_yaml()))
    assert cfg2 == cfg


def test_registry():
    reg = Registry("thing")

    @reg.register()
    class Foo:
        pass

    @reg.register("bar")
    def make_bar():
        return 42

    assert reg("Foo") is Foo
    assert reg("bar")() == 42
    assert "Foo" in reg
    with pytest.raises(KeyError, match="valid choices"):
        reg("nope")


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283
    # mask is invertible-ish sanity: differs from raw crc
    assert masked_crc32c(b"abc") != crc32c(b"abc")


def test_event_file_records_parse(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("loss", 0.5, 3)
    img = np.zeros((4, 4, 3), np.uint8)
    from iprgan_tpu.utils.tb_writer import encode_png

    w.add_image("sample", encode_png(img), 4, 4, 1)
    w.flush()

    files = [f for f in os.listdir(tmp_path) if f.startswith("events")]
    assert len(files) == 1
    blob = open(os.path.join(tmp_path, files[0]), "rb").read()

    # walk TFRecord framing and verify crcs
    off, n = 0, 0
    while off < len(blob):
        (length,) = struct.unpack("<Q", blob[off:off + 8])
        (hcrc,) = struct.unpack("<I", blob[off + 8:off + 12])
        assert hcrc == masked_crc32c(blob[off:off + 8])
        data = blob[off + 12:off + 12 + length]
        (dcrc,) = struct.unpack("<I", blob[off + 12 + length:off + 16 + length])
        assert dcrc == masked_crc32c(data)
        off += 16 + length
        n += 1
    assert n == 3  # file_version + scalar + image


def test_make_grid_shape():
    imgs = np.random.rand(10, 8, 8, 3).astype(np.float32)
    grid = make_grid(imgs, per_row=4, pad=2)
    # 3 rows x 4 cols of 8px + padding
    assert grid.shape == (3 * 10 + 2, 4 * 10 + 2, 3)


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "G": {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}},
        "optG": {"count": np.int32(5)},
        "step": 42,
    }
    p = str(tmp_path / checkpoint.CKPT_NAME)
    checkpoint.save(p, state)
    out = checkpoint.load(p)
    assert out["step"] == 42
    np.testing.assert_array_equal(out["G"]["params"]["w"],
                                  state["G"]["params"]["w"])

    state["step"] = checkpoint.END_SENTINEL
    checkpoint.save(p, state)
    assert checkpoint.load(p)["step"] == "END"


def test_frechet_distance_closed_form():
    d = 8
    mu1 = np.zeros(d)
    mu2 = np.ones(d)
    sigma = np.eye(d)
    # identical covariances: d^2 = ||mu1-mu2||^2
    fid = calculate_frechet_distance(mu1, sigma, mu2, sigma)
    assert np.isclose(fid, d, atol=1e-6)

    # identical distributions -> 0
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 4))
    mu, cov = a.mean(0), np.cov(a, rowvar=False)
    assert calculate_frechet_distance(mu, cov, mu, cov) < 1e-8


def test_inception_score_uniform_is_one():
    prob = np.full((100, 10), 0.1)
    mean, std = calculate_inception_score(prob)
    assert np.isclose(mean, 1.0)
    assert np.isclose(std, 0.0)

    # confident & diverse predictions -> high IS
    prob = np.eye(10)[np.arange(100) % 10] * 0.99 + 0.001
    prob /= prob.sum(1, keepdims=True)
    mean, _ = calculate_inception_score(prob)
    assert mean > 5.0
