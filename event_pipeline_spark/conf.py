"""Runtime configuration loader (parity with
``/root/reference/nexus/conf.py:23-126``).

Layered lookup, later layers overriding earlier ones:

1. package defaults (``event_pipeline_spark/settings.py``),
2. a ``settings.py`` discovered in ``EVENT_PIPELINE_SPARK_CONFIG_DIR``
   (only when that variable is explicitly set — no cwd default, since
   loading a settings file executes it) or one subdirectory below it,
3. the file named by ``$EVENT_PIPELINE_SPARK_CONFIG``,
4. an explicit ``config_file`` argument.

``get(key)`` consults the merged config first; a ``None``/missing value
falls through to the process environment, and a key absent everywhere
raises ``AttributeError`` (mirroring the reference contract, where
attribute access — ``config.MAX_EVENT_RETRIES`` — is the public
surface). Typed accessors (``get_int``/``get_float``/``get_bool``) are
added on top since env values arrive as strings.

The reference loads user files as Python modules; this keeps that
behavior (a settings file IS the public format being reproduced) but
only harvests non-callable UPPERCASE-able module attributes, exactly as
the reference's ``_load_module`` does.
"""

from __future__ import annotations

import importlib.util
import logging
import os
import threading
import typing

from event_pipeline_spark import settings as default_settings

__all__ = ["ConfigLoader", "get_config"]

ENV_CONFIG = "EVENT_PIPELINE_SPARK_CONFIG"
ENV_CONFIG_DIR = "EVENT_PIPELINE_SPARK_CONFIG_DIR"
CONFIG_FILE = "settings.py"

logger = logging.getLogger(__name__)

_default_config: "ConfigLoader | None" = None
_config_lock = threading.Lock()


class ConfigLoader:
    def __init__(self, config_file: str | os.PathLike | None = None):
        self._config: dict[str, typing.Any] = {}
        self._harvest(default_settings)
        for path in self._candidate_files(config_file):
            self.load_from_file(path)

    # -- discovery -----------------------------------------------------

    def _candidate_files(
        self, config_file: str | os.PathLike | None
    ) -> typing.Iterator[str | os.PathLike]:
        found = self._find_in_config_dir()
        if found:
            yield found
        if ENV_CONFIG in os.environ:
            yield os.environ[ENV_CONFIG]
        if config_file:
            yield config_file

    @staticmethod
    def _find_in_config_dir() -> str | None:
        """``settings.py`` in the config dir, else one level down.

        Discovery is gated on ``EVENT_PIPELINE_SPARK_CONFIG_DIR`` being
        explicitly set: defaulting to "." would exec() any settings.py
        that happens to sit in the current working directory — code
        execution by cwd. (The reference auto-discovers from cwd; that
        hazard is deliberately not reproduced.)
        """
        root = os.environ.get(ENV_CONFIG_DIR)
        if not root:
            return None
        direct = os.path.join(root, CONFIG_FILE)
        if os.path.isfile(direct):
            return direct
        try:
            entries = os.listdir(root)
        except OSError as e:
            logger.debug("cannot scan config dir %s: %s", root, e)
            return None
        for item in sorted(entries):
            nested = os.path.join(root, item, CONFIG_FILE)
            if os.path.isfile(nested):
                return nested
        return None

    # -- loading -------------------------------------------------------

    def _harvest(self, module: typing.Any) -> None:
        for name in dir(module):
            if name.startswith("__"):
                continue
            value = getattr(module, name)
            if callable(value):
                continue
            self._config[name.upper()] = value

    def load_from_file(self, config_file: str | os.PathLike) -> None:
        if not os.path.exists(config_file):
            logger.info("config file %s does not exist; skipping", config_file)
            return
        spec = importlib.util.spec_from_file_location("settings", config_file)
        if spec is None or spec.loader is None:
            logger.warning("could not load spec for %s", config_file)
            return
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        self._harvest(module)

    # -- access --------------------------------------------------------

    def get(self, key: str, default: typing.Any = None) -> typing.Any:
        """Config value, else environment, else ``default``; raises
        ``AttributeError`` when all three are None/absent. (The caller
        default also applies when a key is DECLARED with value None —
        the declared-but-env-driven knobs in settings.py.)"""
        value = self._config.get(key)
        if value is None:
            value = os.environ.get(key)
        if value is None:
            value = default
        if value is None:
            raise AttributeError(f"Missing configuration key '{key}'")
        return value

    def get_int(self, key: str, default: int | None = None) -> int:
        return int(self.get(key, default))

    def get_float(self, key: str, default: float | None = None) -> float:
        return float(self.get(key, default))

    def get_bool(self, key: str, default: bool | None = None) -> bool:
        v = self.get(key, default)
        if isinstance(v, str):
            return v.strip().lower() not in ("", "0", "false", "no", "off")
        return bool(v)

    def __getattr__(self, item: str) -> typing.Any:
        if item.startswith("_"):
            raise AttributeError(
                f"'{type(self).__name__}' object has no attribute '{item}'"
            )
        return self.get(item.upper())

    def __repr__(self) -> str:
        return f"ConfigLoader <len={len(self._config)}>"


def get_config(config_file: str | os.PathLike | None = None) -> ConfigLoader:
    """Lazily-built process-wide config (reference conf.py:116-126)."""
    global _default_config
    if _default_config is None:
        with _config_lock:
            if _default_config is None:
                _default_config = ConfigLoader(config_file=config_file)
    return _default_config
