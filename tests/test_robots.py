"""robots.txt parsing and RFC 9309 crawl verdicts."""
import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.robots import (
    crawl_allowed,
    parse_robots,
    url_path,
)

ROBOTS = """# policy file
User-agent: googlebot
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:
Crawl-delay: 10
"""


@pytest.fixture
def rules(spark_session):
    df = spark_session.createDataFrame(
        [('a.com', ROBOTS)], 'host string, robots_txt string')
    return parse_robots(df)


def _verdicts(spark, rules, urls):
    df = spark.createDataFrame([(u,) for u in urls], 'url string')
    return {r['url']: r['allowed'] for r in
            crawl_allowed(df, 'url', rules).collect()}


class TestParseRobots:
    def test_star_group_only(self, rules):
        got = {(r['rule'], r['prefix']) for r in rules.collect()}
        # googlebot group ignored; empty Disallow and Crawl-delay
        # dropped
        assert got == {('disallow', '/private'),
                       ('allow', '/private/ok')}

    def test_specific_agent_beats_star(self, spark_session):
        df = spark_session.createDataFrame(
            [('a.com', ROBOTS)], 'host string, robots_txt string')
        got = {(r['rule'], r['prefix']) for r in
               parse_robots(df, user_agent='googlebot').collect()}
        assert got == {('disallow', '/')}

    def test_stacked_agents_share_group(self, spark_session):
        txt = ('User-agent: x\nUser-agent: *\nDisallow: /no\n\n'
               'User-agent: y\nDisallow: /other\n')
        df = spark_session.createDataFrame(
            [('h.com', txt)], 'host string, robots_txt string')
        got = {(r['rule'], r['prefix']) for r in
               parse_robots(df).collect()}
        assert got == {('disallow', '/no')}

    def test_rules_before_any_group_ignored(self, spark_session):
        txt = 'Disallow: /early\nUser-agent: *\nDisallow: /late\n'
        df = spark_session.createDataFrame(
            [('h.com', txt)], 'host string, robots_txt string')
        got = {r['prefix'] for r in parse_robots(df).collect()}
        assert got == {'/late'}


class TestCrawlAllowed:
    def test_longest_match_and_default(self, spark_session, rules):
        v = _verdicts(spark_session, rules, [
            'https://a.com/public/x',      # no match -> allowed
            'https://a.com/private/z',     # disallow /private
            'https://a.com/private/ok/1',  # allow beats shorter
            'https://a.com/',              # root, no rule
            'https://other.com/private/z',  # host without rules
        ])
        assert v == {
            'https://a.com/public/x': True,
            'https://a.com/private/z': False,
            'https://a.com/private/ok/1': True,
            'https://a.com/': True,
            'https://other.com/private/z': True,
        }

    def test_allow_wins_equal_length_tie(self, spark_session):
        txt = 'User-agent: *\nDisallow: /p\nAllow: /q\n'
        df = spark_session.createDataFrame(
            [('h.com', txt.replace('/q', '/p'))],
            'host string, robots_txt string')
        v = _verdicts(spark_session, parse_robots(df),
                      ['https://h.com/p/x'])
        assert v['https://h.com/p/x'] is True

    def test_path_excludes_query_and_fragment(self, spark_session):
        df = spark_session.createDataFrame(
            [('https://h.com/a/b?x=/private#/c',),
             ('https://h.com',)], 'url string')
        paths = [r['p'] for r in
                 df.select(url_path('url').alias('p')).collect()]
        assert paths == ['/a/b', '/']

    def test_no_udf_in_plan(self, spark_session, rules):
        df = spark_session.createDataFrame(
            [('https://a.com/x',)], 'url string')
        plan = crawl_allowed(
            df, 'url', rules)._jdf.queryExecution().executedPlan().toString()
        assert 'Python' not in plan  # pure codegen + join + agg
