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


class TestWildcardRules:
    """RFC 9309 §2.2.3: ``*`` matches any run, trailing ``$``
    anchors the path end; specificity is raw-rule octet length."""

    def _rules(self, spark, txt):
        df = spark.createDataFrame(
            [('w.com', 'User-agent: *\n' + txt)],
            'host string, robots_txt string')
        return parse_robots(df)

    def test_star_matches_any_run(self, spark_session):
        rules = self._rules(spark_session, 'Disallow: /*/print\n')
        v = _verdicts(spark_session, rules, [
            'https://w.com/a/print',
            'https://w.com/a/b/print/x',   # '*' spans '/'; suffix ok
            'https://w.com/print',          # nothing between the /s
            'https://w.com/a/page',
        ])
        assert v == {
            'https://w.com/a/print': False,
            'https://w.com/a/b/print/x': False,
            'https://w.com/print': True,
            'https://w.com/a/page': True,
        }

    def test_dollar_anchors_end(self, spark_session):
        rules = self._rules(spark_session, 'Disallow: /*.pdf$\n')
        v = _verdicts(spark_session, rules, [
            'https://w.com/docs/a.pdf',
            'https://w.com/docs/a.pdf.html',   # not at path end
            'https://w.com/docs/apdf',         # '.' is literal
        ])
        assert v == {
            'https://w.com/docs/a.pdf': False,
            'https://w.com/docs/a.pdf.html': True,
            'https://w.com/docs/apdf': True,
        }

    def test_wildcard_allow_beats_shorter_disallow(
            self, spark_session):
        rules = self._rules(
            spark_session,
            'Disallow: /shop\nAllow: /shop/*/sale$\n')
        v = _verdicts(spark_session, rules, [
            'https://w.com/shop/x/sale',
            'https://w.com/shop/x/cart',
        ])
        assert v == {
            'https://w.com/shop/x/sale': True,   # len 13 > len 5
            'https://w.com/shop/x/cart': False,
        }

    def test_mid_rule_dollar_is_literal(self, spark_session):
        rules = self._rules(spark_session, 'Disallow: /a$b\n')
        v = _verdicts(spark_session, rules, [
            'https://w.com/a$b/x', 'https://w.com/ab/x'])
        assert v == {'https://w.com/a$b/x': False,
                     'https://w.com/ab/x': True}

    def test_plain_rules_still_startswith(self, spark_session):
        # regex metachars in a PLAIN rule must stay literal via the
        # startswith fast path
        rules = self._rules(spark_session, 'Disallow: /a.b\n')
        v = _verdicts(spark_session, rules, [
            'https://w.com/a.b/x', 'https://w.com/axb/x'])
        assert v == {'https://w.com/a.b/x': False,
                     'https://w.com/axb/x': True}

    def test_no_udf_with_wildcards(self, spark_session):
        rules = self._rules(spark_session, 'Disallow: /*.gif$\n')
        df = spark_session.createDataFrame(
            [('https://w.com/x.gif',)], 'url string')
        plan = crawl_allowed(df, 'url', rules)._jdf \
            .queryExecution().executedPlan().toString()
        assert 'Python' not in plan


class TestRobotsSitemaps:
    def test_group_independent_discovery(self, spark_session):
        from ons_utils_spark.operators.robots import robots_sitemaps
        txt = ('Sitemap: https://h.com/before-any-group.xml\n'
               'User-agent: googlebot\nDisallow: /\n'
               'sitemap: https://h.com/mid.xml  # comment\n'
               'User-agent: *\nDisallow: /x\n'
               'SITEMAP: https://h.com/last.xml\n'
               'NotASitemap: https://h.com/no.xml\n')
        df = spark_session.createDataFrame(
            [('h.com', txt)], 'host string, robots_txt string')
        got = {r['sitemap_url'] for r in robots_sitemaps(df).collect()}
        # found anywhere in the file, any directive case, comments
        # stripped; non-sitemap directives ignored
        assert got == {'https://h.com/before-any-group.xml',
                       'https://h.com/mid.xml',
                       'https://h.com/last.xml'}


class TestCrawlDelays:
    def test_group_selection_min_and_default(self, spark_session):
        from ons_utils_spark.operators.robots import crawl_delays
        rows = [
            # googlebot delay ignored for *; * group has 2.5 then 7
            ('a.com', 'User-agent: googlebot\nCrawl-delay: 60\n\n'
                      'User-agent: *\nDisallow: /x\n'
                      'Crawl-delay: 2.5\nCrawl-delay: 7\n'),
            # invalid value -> default
            ('b.com', 'User-agent: *\nCrawl-delay: fast\n'),
            # no delay line at all -> default
            ('c.com', 'User-agent: *\nDisallow: /p\n'),
            # delay in an unselected group only -> default
            ('d.com', 'User-agent: googlebot\nCrawl-delay: 9\n'),
        ]
        df = spark_session.createDataFrame(
            rows, 'host string, robots_txt string')
        got = {r['host']: r['crawl_delay']
               for r in crawl_delays(df).collect()}
        assert got == {'a.com': 2.5, 'b.com': 1.0,
                       'c.com': 1.0, 'd.com': 1.0}

    def test_specific_agent_delay(self, spark_session):
        from ons_utils_spark.operators.robots import crawl_delays
        df = spark_session.createDataFrame(
            [('a.com', 'User-agent: googlebot\nCrawl-delay: 60\n\n'
                       'User-agent: *\nCrawl-delay: 2\n')],
            'host string, robots_txt string')
        got = crawl_delays(df, user_agent='googlebot').first()
        assert got['crawl_delay'] == 60.0
