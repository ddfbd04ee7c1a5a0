"""Config validation: schema rules + catalog/filesystem existence.

Parity target: ``ons_utils/config/validation.py`` — cerberus schema
validation plus Hive-table and HDFS-path existence checks, collected
into one underlined error report per section.

Differences from the reference (intentional, SURVEY.md §7.0):

* cerberus isn't available here; :class:`MiniValidator` implements the
  subset the reference used (type / required / allowed / nested
  schema / min / max, ``allow_unknown`` semantics). If cerberus IS
  installed it is used instead.
* table existence uses the public ``spark.catalog.tableExists``
  (the reference reached into the JVM catalog, validation.py:318-320).
* filesystem existence is injectable (``path_exists`` callable) so
  no HDFS client is needed in tests; the reference had a latent
  NameError from a missing ``hdfs`` import (validation.py:315).
* ``get_inner`` recursion passes the config through (the reference
  dropped the argument, validation.py:275).
"""
from __future__ import annotations

import os
from typing import Any, Callable, List, Mapping, Optional, Sequence

try:  # pragma: no cover - exercised only when cerberus is installed
    import cerberus

    HAS_CERBERUS = True
except ImportError:
    HAS_CERBERUS = False


class MiniValidator:
    """Minimal cerberus-compatible validator.

    Supports per-field rules: ``type`` (str name or list),
    ``required``, ``allowed``, ``min``/``max``, ``schema`` (nested
    mapping). Unknown fields are allowed (cerberus
    ``allow_unknown=True``).

    A schema using any OTHER cerberus rule (``regex``, ``coerce``,
    custom rules, ...) raises ``ValueError`` instead of silently
    under-validating — install cerberus or inject a full validator
    via :func:`set_validator_factory` for those.
    """

    _RULES = {'type', 'required', 'allowed', 'min', 'max', 'schema'}

    _TYPES = {
        'string': str,
        'integer': int,
        'float': (int, float),
        'number': (int, float),
        'boolean': bool,
        'list': (list, tuple),
        'dict': dict,
    }

    def __init__(self, schema: Mapping[str, Any]):
        self.schema = schema
        self.errors: dict = {}

    def validate(self, document: Mapping[str, Any]) -> bool:
        self.errors = self._validate(document, self.schema)
        return not self.errors

    def _validate(
        self, doc: Mapping[str, Any], schema: Mapping[str, Any]
    ) -> dict:
        errors: dict = {}
        for field, rules in schema.items():
            unsupported = set(rules) - self._RULES
            if unsupported:
                raise ValueError(
                    f'schema rule(s) {sorted(unsupported)} for field'
                    f' {field!r} are outside MiniValidator\'s subset'
                    f' {sorted(self._RULES)} — install cerberus or'
                    f' inject a validator via set_validator_factory')
            if field not in doc or doc[field] is None:
                if rules.get('required'):
                    errors[field] = ['required field']
                continue
            value = doc[field]
            field_errors: list = []
            expected = rules.get('type')
            if expected:
                names = (
                    expected if isinstance(expected, list) else [expected]
                )
                ok = any(
                    isinstance(value, self._TYPES[n])
                    and not (n == 'integer' and isinstance(value, bool))
                    for n in names
                )
                if not ok:
                    field_errors.append(
                        f'must be of type {expected!r}'
                    )
            if 'allowed' in rules and value not in rules['allowed']:
                field_errors.append(
                    f'unallowed value {value!r}'
                )
            if 'min' in rules and isinstance(value, (int, float)) \
                    and value < rules['min']:
                field_errors.append(f'min value is {rules["min"]}')
            if 'max' in rules and isinstance(value, (int, float)) \
                    and value > rules['max']:
                field_errors.append(f'max value is {rules["max"]}')
            if 'schema' in rules and isinstance(value, Mapping):
                nested = self._validate(value, rules['schema'])
                if nested:
                    field_errors.append(nested)
            if field_errors:
                errors[field] = field_errors
        return errors


# Injected validator factory (highest precedence): any callable
# schema -> validator exposing .validate(doc) and .errors — lets a
# deployment plug in full cerberus (custom rules, coercions) or any
# other engine without monkeypatching.
_VALIDATOR_FACTORY: Optional[Callable[[Mapping[str, Any]], Any]] = None


def set_validator_factory(
    factory: Optional[Callable[[Mapping[str, Any]], Any]],
) -> None:
    """Install (or clear with ``None``) the validator factory used by
    :func:`get_validator`."""
    global _VALIDATOR_FACTORY
    _VALIDATOR_FACTORY = factory


def get_validator(schema: Mapping[str, Any]):
    """Injected factory if set, else cerberus when installed, else
    :class:`MiniValidator` (which raises on rules outside its
    documented subset rather than silently under-validating)."""
    if _VALIDATOR_FACTORY is not None:
        return _VALIDATOR_FACTORY(schema)
    if HAS_CERBERUS:  # pragma: no cover
        return cerberus.Validator(schema, allow_unknown=True)
    return MiniValidator(schema)


def get_cerberus_errors(
    config: Mapping[str, Any], schema: Mapping[str, Any]
) -> List[str]:
    """Flatten schema-validation errors into strings."""
    v = get_validator(schema)
    if v.validate(dict(config)):
        return []
    return [
        f'{field}: {remove_list_wrappers(err)}'
        for field, err in v.errors.items()
    ]


def validate_config_sections(
    config: Mapping[str, Any],
    section_schemas: Mapping[str, Mapping[str, Any]],
    spark=None,
    path_exists: Optional[Callable[[str], bool]] = None,
) -> List[str]:
    """Validate each config section: schema + table + path existence.

    Sections with ``active: false`` are skipped (reference
    validation.py:250-259). Table references live under a ``tables``
    key as ``db.table`` strings; paths under a ``filepaths`` key.
    """
    errors: List[str] = []
    for section, schema in section_schemas.items():
        inner = get_inner(config, section)
        if inner is None:
            errors.append(get_underlined_header(section)
                          + f'\nmissing section {section!r}')
            continue
        if isinstance(inner, Mapping) and inner.get('active') is False:
            continue
        section_errors = get_cerberus_errors(inner, schema)
        if spark is not None:
            section_errors += get_table_errors(spark, inner)
        if path_exists is not None:
            section_errors += get_filepath_errors(inner, path_exists)
        if section_errors:
            errors.append(
                get_underlined_header(section) + '\n'
                + '\n'.join(section_errors)
            )
    return errors


# Reference entry-point name (reference ons_utils/config/
# validation.py:106) — alias so ports diff clean.
validate_webscraped_scenario_config = validate_config_sections


def get_all_errors(
    config: Mapping[str, Any],
    section_schemas: Mapping[str, Mapping[str, Any]],
    spark=None,
    path_exists: Optional[Callable[[str], bool]] = None,
) -> str:
    """One joined report of every validation error ('' when clean)."""
    return '\n\n'.join(
        validate_config_sections(config, section_schemas, spark,
                                 path_exists)
    )


def get_inner(config: Mapping[str, Any], section: str) -> Optional[Any]:
    """Fetch a (possibly dotted) nested section."""
    cur: Any = config
    for part in section.split('.'):
        if not isinstance(cur, Mapping) or part not in cur:
            return None
        cur = cur[part]
    return cur


# ---- existence checks ------------------------------------------------

def table_exists(spark, table: str) -> bool:
    """Catalog existence via the public API (works for Hive tables)."""
    return spark.catalog.tableExists(table)


def get_table_errors(spark, section: Mapping[str, Any]) -> List[str]:
    """Check every ``db.table`` under the section's ``tables`` key."""
    tables = section.get('tables') or {}
    if isinstance(tables, Mapping):
        tables = list(tables.values())
    return [
        f'table does not exist: {t}'
        for t in tables
        if not table_exists(spark, t)
    ]


def local_path_exists(path: str) -> bool:
    """Default path checker (local/posix). On a cluster inject a
    checker built on the Hadoop FileSystem API:

    ``lambda p: spark._jvm.org.apache.hadoop.fs...`` or ``pyarrow.fs``.
    """
    return os.path.exists(path)


# Injected per-scheme checkers (highest precedence).  Lets tests and
# deployments plug in a checker for any URL scheme without monkey-
# patching — e.g. ``register_scheme_checker('s3', my_fsspec_check)``.
_SCHEME_CHECKERS: dict = {}


def register_scheme_checker(
    scheme: str, checker: Callable[[str], bool],
) -> None:
    """Register (or override, or remove with ``None``) the existence
    checker used by :func:`remote_path_exists` for ``scheme``."""
    if checker is None:
        _SCHEME_CHECKERS.pop(scheme, None)
    else:
        _SCHEME_CHECKERS[scheme] = checker


def remote_path_exists(path: str, spark=None) -> bool:
    """Scheme-dispatching path existence check — the full remote-FS
    counterpart of the reference's HDFS-only checker
    (reference ons_utils/config/validation.py:296-315, whose own
    ``hdfs`` import is a latent NameError).

    Resolution order:

    1. a checker injected via :func:`register_scheme_checker`;
    2. no scheme / ``file://`` → :func:`local_path_exists`;
    3. a live ``spark`` session → the Hadoop FileSystem API (covers
       ``hdfs://``, ``s3a://``, ``gs://``, ... — whatever the
       cluster's Hadoop conf can mount);
    4. ``fsspec`` if importable (covers ``s3://``, ``gcs://``, ...).

    Raises ``ValueError`` for a scheme nothing can handle — a config
    pointing at ``hdfs://`` must never be silently "checked" against
    the local filesystem (the round-6 parity gap)."""
    from urllib.parse import urlparse

    scheme = urlparse(path).scheme
    if scheme in _SCHEME_CHECKERS:
        return bool(_SCHEME_CHECKERS[scheme](path))
    if scheme == '':
        return local_path_exists(path)
    if spark is not None:
        # A scheme the cluster's Hadoop conf cannot mount throws an
        # opaque Py4J error ('No FileSystem for scheme ...') — fall
        # through to fsspec / the ValueError contract instead of
        # aborting the whole validation run.
        try:
            jvm = spark._jvm
            conf = spark._jsc.hadoopConfiguration()
            p = jvm.org.apache.hadoop.fs.Path(path)
            fs = p.getFileSystem(conf)
            return bool(fs.exists(p))
        except Exception:  # noqa: BLE001 — unmountable scheme
            pass
    if scheme == 'file':
        return local_path_exists(urlparse(path).path)
    try:
        import fsspec
    except ImportError:
        raise ValueError(
            f'no checker for scheme {scheme!r} ({path}): register one'
            f' via register_scheme_checker, pass a SparkSession whose'
            f' Hadoop conf mounts it, or install fsspec')
    fs, fs_path = fsspec.core.url_to_fs(path)
    return bool(fs.exists(fs_path))


def make_path_checker(spark=None) -> Callable[[str], bool]:
    """A ``path_exists`` callable for :func:`get_filepath_errors`
    bound to an optional SparkSession — the deployment-ready default
    for configs mixing local and remote paths."""
    return lambda p: remote_path_exists(p, spark)


def get_filepath_errors(
    section: Mapping[str, Any],
    path_exists: Callable[[str], bool] = local_path_exists,
) -> List[str]:
    """Check every path under the section's ``filepaths`` key."""
    paths = section.get('filepaths') or {}
    if isinstance(paths, Mapping):
        paths = list(paths.values())
    return [
        f'path does not exist: {p}'
        for p in paths
        if not path_exists(p)
    ]


# ---- formatting ------------------------------------------------------

def get_underlined_header(header: str, char: str = '-') -> str:
    """Header text over a same-length underline."""
    return f'{header}\n{char * len(header)}'


def remove_list_wrappers(obj: Any) -> Any:
    """Unwrap single-element list wrappers recursively (cerberus nests
    errors as 1-lists)."""
    if isinstance(obj, list) and len(obj) == 1:
        return remove_list_wrappers(obj[0])
    if isinstance(obj, list):
        return [remove_list_wrappers(x) for x in obj]
    if isinstance(obj, dict):
        return {k: remove_list_wrappers(v) for k, v in obj.items()}
    return obj
