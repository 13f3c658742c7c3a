"""ConfigLoader: layering (defaults < discovered file < env file <
explicit file), env fall-through for None keys, attribute access, and
typed accessors. Mirrors the reference loader's contract
(/root/reference/nexus/conf.py:23-126)."""

from __future__ import annotations

import pytest

from event_pipeline_spark import conf
from event_pipeline_spark.conf import ConfigLoader, get_config


@pytest.fixture(autouse=True)
def _isolate(monkeypatch, tmp_path):
    """Point discovery at an empty dir and reset the singleton."""
    monkeypatch.setenv(conf.ENV_CONFIG_DIR, str(tmp_path / "empty"))
    monkeypatch.delenv(conf.ENV_CONFIG, raising=False)
    (tmp_path / "empty").mkdir()
    conf._default_config = None
    yield
    conf._default_config = None


def test_defaults_loaded_and_attribute_access():
    c = ConfigLoader()
    assert c.MAX_EVENT_RETRIES == 5
    assert c.get("MAX_EVENT_BACKOFF_FACTOR") == 0.05
    assert c.MAX_BATCH_PROCESSING_WORKERS == 4
    assert "ConfigLoader" in repr(c)


def test_explicit_file_overrides_defaults(tmp_path):
    f = tmp_path / "mysettings.py"
    f.write_text("MAX_EVENT_RETRIES = 9\nCUSTOM_KNOB = 'on'\n")
    c = ConfigLoader(config_file=str(f))
    assert c.MAX_EVENT_RETRIES == 9
    assert c.CUSTOM_KNOB == "on"
    assert c.MAX_EVENT_BACKOFF == 100.0  # untouched default survives


def test_config_dir_discovery_one_level_deep(monkeypatch, tmp_path):
    proj = tmp_path / "proj"
    (proj / "app").mkdir(parents=True)
    (proj / "app" / "settings.py").write_text("MAX_EVENT_RETRIES = 7\n")
    monkeypatch.setenv(conf.ENV_CONFIG_DIR, str(proj))
    assert ConfigLoader().MAX_EVENT_RETRIES == 7
    # a settings.py directly in the dir wins over the nested one
    (proj / "settings.py").write_text("MAX_EVENT_RETRIES = 8\n")
    assert ConfigLoader().MAX_EVENT_RETRIES == 8


def test_env_file_layer_and_explicit_file_precedence(monkeypatch, tmp_path):
    env_f = tmp_path / "env_settings.py"
    env_f.write_text("LAYERED = 'env'\nONLY_ENV = 1\n")
    exp_f = tmp_path / "explicit.py"
    exp_f.write_text("LAYERED = 'explicit'\n")
    monkeypatch.setenv(conf.ENV_CONFIG, str(env_f))
    c = ConfigLoader(config_file=str(exp_f))
    assert c.LAYERED == "explicit"  # explicit file loads last
    assert c.ONLY_ENV == 1


def test_none_values_fall_through_to_environ(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "16")
    c = ConfigLoader()
    assert c.get("SPARK_GRAFT_CPUS") == "16"  # default None → environ
    assert c.get_int("SPARK_GRAFT_CPUS") == 16
    monkeypatch.delenv("SPARK_GRAFT_CPUS")
    with pytest.raises(AttributeError, match="SPARK_GRAFT_CPUS"):
        c.get("SPARK_GRAFT_CPUS")
    assert c.get("SPARK_GRAFT_CPUS", "32") == "32"  # caller default


def test_typed_accessors(monkeypatch):
    c = ConfigLoader()
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SCALE", "0")
    assert c.get_bool("SPARK_GRAFT_BENCH_SCALE") is False
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SCALE", "true")
    assert c.get_bool("SPARK_GRAFT_BENCH_SCALE") is True
    assert c.get_float("MAX_EVENT_BACKOFF") == 100.0


def test_missing_file_is_skipped_and_callables_ignored(tmp_path):
    f = tmp_path / "s.py"
    f.write_text("def helper():\n    return 1\nVALUE = helper()\n")
    c = ConfigLoader(config_file=str(f))
    assert c.VALUE == 1
    with pytest.raises(AttributeError):
        c.HELPER  # callables are not harvested
    ConfigLoader(config_file=str(tmp_path / "absent.py"))  # no raise


def test_singleton_is_lazy_and_shared():
    a, b = get_config(), get_config()
    assert a is b
