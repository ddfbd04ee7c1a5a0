"""Tests for Config loading and validation."""
import pytest
import yaml

from ons_utils_spark.config.config import (
    ENV_VAR,
    Config,
    ConfigFormatError,
)
from ons_utils_spark.config.validation import (
    MiniValidator,
    get_all_errors,
    get_cerberus_errors,
    get_inner,
    get_underlined_header,
    remove_list_wrappers,
    validate_config_sections,
)

SAMPLE = {
    'my_attr': 'test',
    'bells': {'big_ben': {'dongs': 12}},
    'whistles': ['referee', 'dog'],
    'paris': {
        'landmarks': ['arc de triomphe', 'eiffel tower'],
        'museums': ['le louvre'],
    },
}


@pytest.fixture
def config_file(tmp_path, monkeypatch):
    path = tmp_path / 'scenario.yaml'
    path.write_text(yaml.safe_dump(SAMPLE))
    monkeypatch.setenv(ENV_VAR, str(tmp_path))
    return path


class TestConfig:
    def test_load_sets_attrs(self, config_file):
        cfg = Config('scenario')
        assert cfg.my_attr == 'test'
        assert cfg.bells == {'big_ben': {'dongs': 12}}
        assert cfg.whistles == ['referee', 'dog']

    def test_explicit_dir(self, config_file):
        cfg = Config('scenario', config_dir=config_file.parent)
        assert cfg.my_attr == 'test'

    def test_missing_raises(self, tmp_path, monkeypatch):
        monkeypatch.setenv(ENV_VAR, str(tmp_path))
        with pytest.raises(FileNotFoundError):
            Config('nope')

    def test_unpack(self, config_file):
        cfg = Config('scenario', to_unpack=['paris'])
        assert cfg.landmarks == ['arc de triomphe', 'eiffel tower']
        assert not hasattr(cfg, 'paris')

    def test_unpack_non_mapping_raises(self, config_file):
        with pytest.raises(ConfigFormatError):
            Config('scenario', to_unpack=['my_attr'])

    def test_flatten_nested_dicts(self, config_file):
        cfg = Config('scenario')
        cfg.flatten_nested_dicts('bells')
        assert cfg.bells == {('big_ben', 'dongs'): 12}

    def test_fill_tuple_keys(self, config_file):
        cfg = Config('scenario')
        cfg.flatten_nested_dicts('bells')
        cfg.bells[('solo',)] = 1
        cfg.fill_tuple_keys('bells', fill_method='bfill')
        assert (None, 'solo') in cfg.bells

    def test_extend_and_remove(self, config_file):
        cfg = Config('scenario')
        cfg.extend_attr('whistles', ['cat'])
        assert cfg.whistles == ['referee', 'dog', 'cat']
        cfg.remove_from_attr('whistles', ['dog'])
        assert cfg.whistles == ['referee', 'cat']

    def test_prepend_dir(self, config_file):
        cfg = Config('scenario')
        cfg.my_paths = {'a': 'x.parquet'}
        cfg.prepend_dir('my_paths', '/data')
        assert cfg.my_paths == {'a': '/data/x.parquet'}


class TestMiniValidator:
    def test_valid(self):
        v = MiniValidator({'n': {'type': 'integer', 'min': 0}})
        assert v.validate({'n': 5, 'extra': 'ignored'})

    def test_type_error(self):
        v = MiniValidator({'n': {'type': 'integer'}})
        assert not v.validate({'n': 'five'})
        assert 'n' in v.errors

    def test_bool_is_not_integer(self):
        v = MiniValidator({'n': {'type': 'integer'}})
        assert not v.validate({'n': True})

    def test_required_allowed_nested(self):
        schema = {
            'mode': {'required': True, 'allowed': ['a', 'b']},
            'inner': {'schema': {'x': {'type': 'integer'}}},
        }
        v = MiniValidator(schema)
        assert not v.validate({'mode': 'c', 'inner': {'x': 'bad'}})
        assert set(v.errors) == {'mode', 'inner'}
        assert v.validate({'mode': 'a', 'inner': {'x': 1}})


class TestValidationReport:
    def test_sections_and_inactive_skip(self, tmp_path):
        cfg = {
            'web': {'active': False, 'n': 'not-an-int'},
            'scan': {'n': 'not-an-int',
                     'filepaths': {'f': str(tmp_path / 'missing')}},
        }
        schemas = {
            'web': {'n': {'type': 'integer'}},
            'scan': {'n': {'type': 'integer'}},
        }
        report = get_all_errors(
            cfg, schemas, path_exists=lambda p: False
        )
        assert 'scan' in report and 'web' not in report
        assert 'does not exist' in report

    def test_table_errors_with_spark(self, spark_session, config_file):
        errors = validate_config_sections(
            {'s': {'tables': ['definitely_missing_table']}},
            {'s': {}},
            spark=spark_session,
        )
        assert errors and 'definitely_missing_table' in errors[0]

    def test_get_inner_dotted(self):
        assert get_inner({'a': {'b': {'c': 1}}}, 'a.b.c') == 1
        assert get_inner({'a': 1}, 'a.b') is None

    def test_formatting_helpers(self):
        assert get_underlined_header('hi') == 'hi\n--'
        assert remove_list_wrappers([['x']]) == 'x'
        assert remove_list_wrappers({'k': [['v']]}) == {'k': 'v'}


class TestRemotePathChecker:
    """Scheme-dispatching existence checks: injected checkers win,
    local paths fall back to os.path, unknown remote schemes fail
    LOUDLY instead of being silently checked against the local FS."""

    def test_injected_fake_remote_scheme(self, tmp_path):
        from ons_utils_spark.config import validation as v
        seen = []

        def fake(path):
            seen.append(path)
            return path.endswith('/exists')

        v.register_scheme_checker('fakefs', fake)
        try:
            assert v.remote_path_exists('fakefs://bucket/exists')
            assert not v.remote_path_exists('fakefs://bucket/missing')
            errs = v.get_filepath_errors(
                {'filepaths': {'a': 'fakefs://b/exists',
                               'b': 'fakefs://b/nope'}},
                path_exists=v.make_path_checker())
            assert errs == ['path does not exist: fakefs://b/nope']
        finally:
            v.register_scheme_checker('fakefs', None)
        assert len(seen) == 4

    def test_local_and_file_scheme(self, tmp_path):
        from ons_utils_spark.config import validation as v
        p = tmp_path / 'x.txt'
        p.write_text('hi')
        assert v.remote_path_exists(str(p))
        assert v.remote_path_exists(f'file://{p}')
        assert not v.remote_path_exists(str(tmp_path / 'missing'))

    def test_unknown_scheme_raises_without_spark_or_fsspec(self):
        from ons_utils_spark.config import validation as v
        with pytest.raises(ValueError, match='no checker for scheme'):
            v.remote_path_exists('hdfs://nn/data/part-0000')

    def test_hadoop_fs_branch_with_spark(self, spark_session, tmp_path):
        from ons_utils_spark.config import validation as v
        p = tmp_path / 'y.txt'
        p.write_text('hi')
        # force the Hadoop FileSystem branch with an explicit scheme
        # the local Hadoop conf can mount
        assert v.remote_path_exists(f'file:{p}', spark=spark_session)
        assert not v.remote_path_exists(
            f'file:{tmp_path}/missing', spark=spark_session)

    def test_reference_entrypoint_alias(self):
        from ons_utils_spark.config import validation as v
        assert (v.validate_webscraped_scenario_config
                is v.validate_config_sections)


class TestValidatorInjection:
    def test_unsupported_rule_raises_loudly(self):
        from ons_utils_spark.config.validation import MiniValidator
        v = MiniValidator({'name': {'type': 'string',
                                    'regex': '^[a-z]+$'}})
        with pytest.raises(ValueError, match='regex'):
            v.validate({'name': 'abc'})

    def test_factory_injection(self):
        from ons_utils_spark.config import validation as v

        class FakeValidator:
            def __init__(self, schema):
                self.schema = schema
                self.errors = {}

            def validate(self, doc):
                if 'bad' in doc:
                    self.errors = {'bad': ['nope']}
                    return False
                return True

        v.set_validator_factory(FakeValidator)
        try:
            assert v.get_cerberus_errors({'ok': 1}, {'any': {}}) == []
            errs = v.get_cerberus_errors({'bad': 1}, {'any': {}})
            assert errs == ['bad: nope']
        finally:
            v.set_validator_factory(None)

    def test_supported_subset_still_validates(self):
        from ons_utils_spark.config.validation import MiniValidator
        v = MiniValidator({'n': {'type': 'integer', 'min': 1}})
        assert not v.validate({'n': 0})
        assert v.validate({'n': 2})
