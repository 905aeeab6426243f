"""Utils tests: profiling scopes, guards, config IO."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbrl_tpu.envs.base import EnvConfig
from pbrl_tpu.train import TrainConfig
from pbrl_tpu.utils import (
    assert_finite,
    check_finite_tree,
    config_to_dict,
    dict_to_config,
    load_json_config,
    profile_scope,
    save_json_config,
    trace_annotation,
)


def test_profile_scope_measures():
    import time

    with profile_scope("x") as out:
        time.sleep(0.01)
    assert out["seconds"] >= 0.01


def test_trace_annotation_wraps_jit():
    with trace_annotation("phase"):
        y = jax.jit(lambda x: x * 2)(jnp.ones(3))
    np.testing.assert_allclose(np.asarray(y), 2.0)


def test_check_finite_tree():
    clean = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert check_finite_tree(clean) == []
    dirty = {"a": jnp.asarray([1.0, jnp.nan]), "b": jnp.ones(1)}
    bad = check_finite_tree(dirty)
    assert len(bad) == 1 and "a" in bad[0]


def test_assert_finite_raises():
    with pytest.raises(FloatingPointError):
        assert_finite(jnp.asarray([1.0, jnp.inf]), "qacc")
        jax.effects_barrier()


def test_config_roundtrip(tmp_path):
    cfg = EnvConfig(policy_dt=1 / 30, controller="stable_pd")
    p = str(tmp_path / "env.json")
    save_json_config(p, cfg)
    cfg2 = load_json_config(p, EnvConfig)
    assert cfg2 == cfg
    # JSON is human-readable and tagged.
    with open(p) as f:
        d = json.load(f)
    assert d["__config__"] == "EnvConfig"


def test_train_config_tuple_fields(tmp_path):
    cfg = TrainConfig(hidden=(64, 32))
    d = config_to_dict(cfg)
    assert d["hidden"] == [64, 32]
    cfg2 = dict_to_config(TrainConfig, d)
    assert cfg2.hidden == (64, 32)


def test_dict_to_config_rejects_unknown():
    with pytest.raises(KeyError):
        dict_to_config(EnvConfig, {"not_a_field": 1})
