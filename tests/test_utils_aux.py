"""Aux utilities: JSONL metric writer, logger, compression-rate reporter
(reference common.py:63-76 logger; main.py:162-226 compressionInfo)."""

import json

import jax.numpy as jnp
import numpy as np


class TestMetricWriter:
    def test_jsonl_roundtrip(self, tmp_path):
        from alignq_tpu.utils.logging_utils import MetricWriter

        w = MetricWriter(str(tmp_path), "train")
        w.write(1, {"loss": 2.5, "top1": np.float32(10.0)})
        w.write(2, {"loss": 1.25})
        w.close()
        recs = [json.loads(ln) for ln in open(w.path)]
        assert [r["step"] for r in recs] == [1, 2]
        assert recs[0]["loss"] == 2.5 and recs[0]["top1"] == 10.0
        assert "time" in recs[1]

    def test_dump_config_roundtrip(self, tmp_path):
        # reference config.txt args dump (utils/common.py:49-54) equivalent
        from alignq_tpu.train.config import TrainConfig
        from alignq_tpu.utils.logging_utils import dump_config

        cfg = TrainConfig(bitW=4, lr_decay_steps=(80, 120), admm=True)
        path = dump_config(cfg, str(tmp_path / "job"))
        rec = json.load(open(path))
        assert rec["bitW"] == 4 and rec["admm"] is True
        assert rec["lr_decay_steps"] == [80, 120]
        assert rec["method"] == "ours"
        # reloadable as a config (tuple fields come back as lists)
        cfg2 = TrainConfig(**{**rec, "lr_decay_steps": tuple(rec["lr_decay_steps"])})
        assert cfg2.bitW == cfg.bitW

    def test_logger_writes_file(self, tmp_path):
        from alignq_tpu.utils.logging_utils import get_logger

        log = get_logger(str(tmp_path / "sub" / "x.log"), name="alignq_test")
        log.info("hello-metric")
        text = open(tmp_path / "sub" / "x.log").read()
        assert "hello-metric" in text


class TestCompressionInfo:
    def test_matches_reference_formula(self):
        from alignq_tpu.utils.compression import compression_info

        params = {
            "conv0": {"kernel": jnp.zeros((3, 3, 3, 16))},       # 432 params
            "layers_0": {"conv0": {"kernel": jnp.zeros((3, 3, 16, 16))},  # 2304
                         "bn0": {"scale": jnp.zeros(16)}},
            "logit": {"kernel": jnp.zeros((16, 10)), "bias": jnp.zeros(10)},
        }
        # reference drops the first conv from the BIT count but counts its
        # params in the fp32 numerator (main.py:185 convs[1:], :179-185):
        # rate = 32*(432+2304) / (32*432 + 4*2304) = 87552/9216 = 9.5
        info = compression_info(params, w_bit=4)
        assert info["conv_params"] == 2736
        assert info["fp32_bits"] == 32 * 2736
        assert info["quant_bits"] == 4 * 2304  # stem excluded from bits
        assert info["compression_rate"] == 9.5
        # include_first: all convs at 4 bits -> exactly 8x
        info_all = compression_info(params, w_bit=4, include_first=True)
        assert info_all["compression_rate"] == 8.0

    def test_mixed_precision_bits_fn(self):
        from alignq_tpu.utils.compression import compression_info

        params = {"a": {"conv0": {"kernel": jnp.zeros((3, 3, 8, 8))}},
                  "b": {"conv1": {"kernel": jnp.zeros((3, 3, 8, 8))}}}
        info = compression_info(params, w_bit=8, include_first=True)
        assert info["compression_rate"] == 4.0
        mixed = compression_info(
            params, include_first=True,
            bits_fn=lambda path: 4 if "conv1" in path else 8,
        )
        # 32*(576+576) / (8*576 + 4*576) = 32/6
        np.testing.assert_allclose(mixed["compression_rate"], 32 / 6)
