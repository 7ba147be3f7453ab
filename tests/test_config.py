"""Config system tests (reference idiom: tests/test_config.py builds every
config to catch schema rot)."""

import pytest

from glsdet_tpu.config import apply_overrides, get_config, list_configs


class TestConfigs:
    def test_all_named_configs_build(self):
        for name in list_configs():
            cfg = get_config(name)
            assert cfg.name == name
            assert cfg.model.num_classes > 0
            assert cfg.train.epochs > 0

    def test_public_api_names_exist(self):
        # BASELINE.json public surface
        assert "coarse_det" in list_configs()
        assert "mp_det_res50" in list_configs()

    def test_yolox_size_family(self):
        # one named config per stock size the reference ships
        # (configs/yolox/yolox_{nano,tiny,s,m,l,x}_8x8_300e_coco.py)
        from glsdet_tpu.models.csp_darknet import PHI_TABLE
        for phi in ("nano", "tiny", "s", "m", "l", "x"):
            cfg = get_config(f"yolox_{phi}_300e")
            assert cfg.model.family == "yolox"
            assert cfg.model.phi == phi
            assert phi in PHI_TABLE
            assert cfg.train.work_dir.endswith(f"yolox_{phi}_300e")
        # nano really is the depthwise variant (reference nano config)
        assert PHI_TABLE["nano"][2] is True

    def test_py_suffix_and_path(self):
        assert get_config("coarse_det.py").name == "coarse_det"
        assert get_config("configs/UFPMP-Det/coarse_det.py").name == \
            "coarse_det"

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_config("nope")

    def test_mp_det_matches_reference_recipe(self):
        cfg = get_config("mp_det_res50")
        assert cfg.model.family == "mpdet"
        assert cfg.model.depth == 50
        assert tuple(cfg.model.proxies_list) == (2, 3, 2, 5, 4, 8, 8, 4, 3, 3)
        assert cfg.model.num_words == 200
        assert cfg.train.epochs == 12
        assert cfg.train.ot_interval == 2000
        assert cfg.train.emd_start_epoch == 2

    def test_overrides(self):
        cfg = get_config("coarse_det")
        apply_overrides(cfg, {"train.base_lr": 0.02,
                              "data.batch_size": 16,
                              "model.phi": "m"})
        assert cfg.train.base_lr == 0.02
        assert cfg.data.batch_size == 16
        assert cfg.model.phi == "m"

    def test_override_bad_key_raises(self):
        cfg = get_config("coarse_det")
        with pytest.raises(AttributeError):
            apply_overrides(cfg, {"train.nonexistent": 1})

    def test_override_type_coercion(self):
        cfg = get_config("coarse_det")
        apply_overrides(cfg, {"train.base_lr": "0.5",
                              "eval.mosaic_buckets": [512, 1024]})
        assert cfg.train.base_lr == 0.5
        assert cfg.eval.mosaic_buckets == (512, 1024)
