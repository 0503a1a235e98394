"""Config presets: every reference-reproduction preset constructs and the
classification ones build models via the registry."""

import dataclasses

from alignq_tpu import configs
from alignq_tpu.models import registry
from alignq_tpu.train.config import TrainConfig
from alignq_tpu.train.da import DAConfig


class TestPresets:
    def test_all_presets_construct(self):
        for name, fn in configs.ALL.items():
            cfg = fn()
            assert isinstance(cfg, TrainConfig), name
            assert cfg.bitW in (4, 5, 8, 32), name

    def test_classification_presets_build_models(self):
        for name in ("resnet20_cifar10_w8a8", "resnet20_cifar10_w4a4_admm",
                     "resnet56_cifar10_w4a4_admm", "densenet40_cifar10",
                     "mobilenetv2_svhn_w8a8",
                     "resnet20_cifar10_w8a8_fast_deploy"):
            model = registry.build_model(configs.ALL[name]())
            assert model is not None, name

    def test_da_presets_are_da_configs(self):
        for name in ("dann_office_d2w_w8a8_admm", "dsan_office_a2w_w4a4",
                     "dann_digits_mnist2mnistm"):
            cfg = configs.ALL[name]()
            assert isinstance(cfg, DAConfig), name

    def test_overrides_apply(self):
        cfg = configs.resnet20_cifar10_w8a8(num_epochs=3, lr=0.1)
        assert cfg.num_epochs == 3 and cfg.lr == 0.1

    def test_digit_preset_disables_correction(self):
        # dann_digit uses plain SGD (dann_digit/main.py:108)
        assert configs.dann_digits_mnist2mnistm().use_correction is False
