"""YAML configuration loading.

Parity target: ``ons_utils/config/config.py`` — ``Config`` loads
``<name>.yaml`` from a discovered config directory and injects keys as
attributes, with nested-mapping unpacking and list/path editing
helpers; ``LoggingConfig`` sets up timestamped console+file logging.

Differences from the reference (intentional, SURVEY.md §7.0):

* the env var is ``ONS_UTILS_SPARK_CONFIG`` (generic, not cprices);
  the search path is env var → ``~/.ons_utils_spark`` → ``~`` → cwd,
  each accepted only if it contains a config dir or the yaml itself.
* ``get_config_dir`` raises ``FileNotFoundError`` instead of
  returning None (the reference's None caused a latent
  AttributeError downstream, config.py:98).
"""
from __future__ import annotations

import logging
import logging.config
import os
from datetime import datetime
from pathlib import Path
from typing import Any, Mapping, Optional, Sequence, Union

import yaml

from ..generic import (
    fill_tuple_keys,
    fill_tuples,
    flatten_dict,
    get_key_value_pairs,
    list_convert,
)

ENV_VAR = 'ONS_UTILS_SPARK_CONFIG'


class ConfigFormatError(Exception):
    """Raised when a config section has an unexpected shape."""

    def __init__(self, attr: str = ''):
        super().__init__(
            f'config attribute {attr!r} must be a mapping to unpack it'
        )


class Config:
    """Load ``<name>.yaml`` and expose its keys as attributes."""

    def __init__(
        self,
        name: str,
        config_dir: Optional[Union[str, Path]] = None,
        to_unpack: Optional[Sequence[str]] = None,
    ):
        self.name = name
        self.config_path = self.get_config_path(config_dir)
        self.update(self.load_config(), to_unpack)

    def get_config_dir(self) -> Path:
        """Locate the directory holding ``<name>.yaml``.

        Order: ``$ONS_UTILS_SPARK_CONFIG`` → ``~/.ons_utils_spark`` →
        ``~`` → cwd → ``cwd/config``. First hit containing the yaml
        wins; FileNotFoundError if none do.
        """
        fname = f'{self.name}.yaml'
        candidates = []
        if os.environ.get(ENV_VAR):
            candidates.append(Path(os.environ[ENV_VAR]))
        candidates += [
            Path.home() / '.ons_utils_spark',
            Path.home(),
            Path.cwd(),
            Path.cwd() / 'config',
        ]
        for cand in candidates:
            if (cand / fname).exists():
                return cand
        raise FileNotFoundError(
            f'no config dir containing {fname} among'
            f' {[str(c) for c in candidates]}; set ${ENV_VAR}'
        )

    def get_config_path(
        self, config_dir: Optional[Union[str, Path]] = None
    ) -> Path:
        """Full path of the yaml file."""
        base = Path(config_dir) if config_dir else self.get_config_dir()
        return base / f'{self.name}.yaml'

    def load_config(self) -> Mapping[str, Any]:
        """``yaml.safe_load`` the config file."""
        with open(self.config_path, encoding='utf-8') as f:
            return yaml.safe_load(f) or {}

    def update(
        self,
        attrs: Mapping[str, Any],
        to_unpack: Optional[Sequence[str]] = None,
    ) -> None:
        """Set mapping entries as attributes, optionally unpacking the
        named nested mappings one level."""
        if not isinstance(attrs, Mapping):
            raise ConfigFormatError(self.name)
        self.set_attrs(attrs, to_unpack)

    def set_attrs(
        self,
        attrs: Mapping[str, Any],
        to_unpack: Optional[Sequence[str]] = None,
    ) -> None:
        to_unpack = list(to_unpack) if to_unpack else []
        for key, value in attrs.items():
            if key in to_unpack:
                if not isinstance(value, Mapping):
                    raise ConfigFormatError(key)
                self.set_attrs(value)
            else:
                setattr(self, key, value)

    # ---- transforms over named attributes ---------------------------

    def flatten_nested_dicts(self, attrs: Sequence[str]) -> None:
        """Replace the named dict attrs with tuple-keyed flat dicts."""
        for attr in list_convert(attrs):
            setattr(self, attr, flatten_dict(getattr(self, attr)))

    def get_key_value_pairs(self, attrs: Sequence[str]) -> None:
        """Replace the named dict attrs with (key, value) pair lists."""
        for attr in list_convert(attrs):
            setattr(self, attr, get_key_value_pairs(getattr(self, attr)))

    def fill_tuples(self, attrs: Sequence[str], **kwargs) -> None:
        for attr in list_convert(attrs):
            setattr(self, attr, fill_tuples(getattr(self, attr), **kwargs))

    def fill_tuple_keys(self, attrs: Sequence[str], **kwargs) -> None:
        for attr in list_convert(attrs):
            setattr(
                self, attr, fill_tuple_keys(getattr(self, attr), **kwargs)
            )

    def extend_attr(self, attr: str, extension: Sequence[Any]) -> None:
        """Extend a list/tuple attribute."""
        current = getattr(self, attr)
        if isinstance(current, tuple):
            setattr(self, attr, current + tuple(extension))
        else:
            setattr(self, attr, list(current) + list(extension))

    def remove_from_attr(self, attr: str, to_remove: Sequence[Any]) -> None:
        """Remove the given values from a list/tuple attribute."""
        current = getattr(self, attr)
        filtered = [x for x in current if x not in set(to_remove)]
        setattr(
            self, attr,
            tuple(filtered) if isinstance(current, tuple) else filtered,
        )

    def prepend_dir(self, attrs: Sequence[str], dir: Union[str, Path]) -> None:
        """Prefix path attrs (str or dict-of-paths) with a directory."""
        for attr in list_convert(attrs):
            current = getattr(self, attr)
            if isinstance(current, Mapping):
                setattr(self, attr, {
                    k: os.path.join(str(dir), v) for k, v in current.items()
                })
            else:
                setattr(self, attr, os.path.join(str(dir), current))


class LoggingConfig:
    """Timestamped console + file logging (dictConfig)."""

    def __init__(
        self,
        log_dir: Optional[Union[str, Path]] = None,
        level: int = logging.INFO,
    ):
        self.log_id = datetime.now().strftime('%Y%m%d_%H%M%S')
        self.log_dir = Path(
            log_dir or Path.home() / '.ons_utils_spark' / 'run_logs'
        )
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.log_path = self.log_dir / f'run_{self.log_id}.log'
        self.level = level

    def create_logging_config(self) -> dict:
        return {
            'version': 1,
            'disable_existing_loggers': False,
            'formatters': {
                'basic': {
                    'format': '%(asctime)s %(levelname)s %(name)s:'
                              ' %(message)s',
                },
            },
            'handlers': {
                'console': {
                    'class': 'logging.StreamHandler',
                    'formatter': 'basic',
                    'level': self.level,
                },
                'file': {
                    'class': 'logging.FileHandler',
                    'filename': str(self.log_path),
                    'formatter': 'basic',
                    'level': self.level,
                },
            },
            'root': {
                'handlers': ['console', 'file'],
                'level': self.level,
            },
        }

    def set_logging_config(self) -> None:
        logging.config.dictConfig(self.create_logging_config())
