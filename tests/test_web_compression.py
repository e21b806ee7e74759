"""Web/domain curation (functions/web.py) and the zlib
compression-ratio signal (textstats.CompressionRatioMapper)."""

import random
import string
import zlib

import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.textstats import CompressionRatioMapper
from smashed_spark.functions.web import DomainFilterMapper, UrlHostMapper


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ---------------------------------------------------------------- web


URL_CASES = [
    ("https://www.Example.COM/path?q=1", "www.example.com", "example.com"),
    ("http://sub.news.co.uk/x", "sub.news.co.uk", "news.co.uk"),
    ("example.com/landing", "example.com", "example.com"),
    ("https://user:pw@deep.a.b.org:8443/p#f", "deep.a.b.org", "b.org"),
    ("ftp://files.example.com.au", "files.example.com.au",
     "example.com.au"),
    ("localhost:8080/admin", "localhost", "localhost"),
    ("   https://spaced.example.net  ", "spaced.example.net",
     "example.net"),
    ("not a url", None, None),
    ("http://", None, None),
    (None, None, None),
]


def test_url_host_and_domain_extraction(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(URL_CASES)],
        "id long, url string",
    )
    out = {
        r["id"]: (r["host"], r["domain"])
        for r in UrlHostMapper().map(df).collect()
    }
    for i, (_, host, domain) in enumerate(URL_CASES):
        assert out[i] == (host, domain), (i, URL_CASES[i], out[i])


def test_url_mapper_is_narrow(spark):
    df = spark.createDataFrame([(1, "https://a.b/c")], "id long, url string")
    plan = _explain(UrlHostMapper().map(df))
    assert "Exchange" not in plan, plan


def _domains_df(spark):
    rows = [
        (1, "spam.example.com"),
        (2, "good.org"),
        (3, "ads.example.com"),
        (4, None),
        (5, "GOOD.org"),  # matching is lowercased
    ]
    return spark.createDataFrame(rows, "id long, domain string")


def test_blocklist_literal_tier(spark):
    df = _domains_df(spark)
    out = DomainFilterMapper(
        blocklist=["spam.example.com", "ADS.example.com"]
    ).map(df)
    assert sorted(r["id"] for r in out.collect()) == [2, 4, 5]
    # literal tier: no join in the plan, the isin folds to a filter
    assert "Join" not in _explain(out)


def test_allowlist_literal_tier_drops_null(spark):
    df = _domains_df(spark)
    out = DomainFilterMapper(allowlist=["good.org"]).map(df)
    assert sorted(r["id"] for r in out.collect()) == [2, 5]


def test_blocklist_dataframe_tier_broadcasts(spark):
    df = _domains_df(spark)
    bl = spark.createDataFrame(
        [("spam.example.com",)], "domain string"
    )
    out = DomainFilterMapper(blocklist=bl).map(df)
    assert sorted(r["id"] for r in out.collect()) == [2, 3, 4, 5]
    tree = _explain(out).split("\n\n")[0]
    assert "BroadcastHashJoin LeftAnti" in tree, tree


def test_allowlist_dataframe_tier(spark):
    df = _domains_df(spark)
    al = spark.createDataFrame([("good.org",)], "d string")
    out = DomainFilterMapper(allowlist=al).map(df)
    assert sorted(r["id"] for r in out.collect()) == [2, 5]
    tree = _explain(out).split("\n\n")[0]
    assert "BroadcastHashJoin LeftSemi" in tree, tree


def test_big_literal_list_promotes_to_join(spark):
    df = _domains_df(spark)
    big = [f"d{i}.com" for i in range(50)] + ["spam.example.com"]
    out = DomainFilterMapper(blocklist=big, max_literal_terms=10).map(df)
    assert sorted(r["id"] for r in out.collect()) == [2, 3, 4, 5]
    assert "BroadcastHashJoin LeftAnti" in _explain(out), _explain(out)


def test_domain_filter_validation(spark):
    with pytest.raises(ValueError, match="exactly one"):
        DomainFilterMapper(blocklist=["a"], allowlist=["b"])
    with pytest.raises(ValueError, match="exactly one"):
        DomainFilterMapper()
    df = _domains_df(spark)
    with pytest.raises(ValueError, match="empty blocklist"):
        DomainFilterMapper(blocklist=[]).map(df)
    with pytest.raises(ValueError, match="one column"):
        DomainFilterMapper(blocklist=df).map(df)


# -------------------------------------------- compression ratio


def test_compression_ratio_matches_python(spark):
    rng = random.Random(5)
    texts = [
        "word " * 200,                       # highly repetitive
        "".join(rng.choice(string.printable) for _ in range(800)),
        "The quick brown fox jumps over the lazy dog. " * 10,
        "短いユニコード文字列です。" * 30,
        None,
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    out = {
        r["id"]: r["compression_ratio"]
        for r in CompressionRatioMapper().map(df).collect()
    }
    for i, t in enumerate(texts):
        if not t:
            assert out[i] is None
        else:
            raw = t.encode("utf-8")
            want = len(zlib.compress(raw, 6)) / len(raw)
            assert out[i] == pytest.approx(want), (i, out[i], want)
    # the signal itself: boilerplate compresses far below random text
    assert out[0] < 0.1 < out[1]


def test_compression_ratio_level_and_validation(spark):
    df = spark.createDataFrame([(1, "abc " * 100)], "id long, text string")
    r9 = CompressionRatioMapper(level=9).map(df).collect()[0][-1]
    raw = ("abc " * 100).encode()
    assert r9 == pytest.approx(len(zlib.compress(raw, 9)) / len(raw))
    with pytest.raises(ValueError, match="level"):
        CompressionRatioMapper(level=0)


def test_compression_ratio_plan_is_narrow_arrow(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, text string")
    plan = _explain(CompressionRatioMapper().map(df))
    assert "ArrowEvalPython" in plan, plan   # vectorized, not BatchEval
    assert "Exchange" not in plan, plan

def test_url_mapper_custom_suffixes_change_the_cut(spark):
    """VERDICT r10 ask #7: a 3-entry custom PSL replaces the built-in
    second-level set and changes the registered-domain cut, including
    a depth-3 suffix (deepest match wins over shallower entries)."""
    df = spark.createDataFrame(
        [
            (0, "https://blog.example.github.io/post"),
            (1, "http://sub.news.co.uk/x"),          # NOT in custom set
            (2, "https://www.city.pref.hokkaido.jp/a"),
            (3, "https://plain.example.com/b"),
        ],
        "id long, url string",
    )
    custom = ["github.io", "pref.hokkaido.jp", "hokkaido.jp"]
    out = {
        r["id"]: r["domain"]
        for r in UrlHostMapper(suffixes=custom).map(df).collect()
    }
    assert out[0] == "example.github.io"       # custom depth-2 entry
    assert out[1] == "co.uk"                   # built-in set replaced
    assert out[2] == "city.pref.hokkaido.jp"   # depth-3 beats depth-2
    assert out[3] == "example.com"             # default last-2 cut


def test_url_mapper_suffixes_dataframe_and_plan_stays_narrow(spark):
    sdf = spark.createDataFrame(
        [("github.io",), ("co.uk",)], "suffix string"
    )
    df = spark.createDataFrame(
        [(0, "https://a.b.github.io/x"), (1, "http://n.co.uk/y")],
        "id long, url string",
    )
    mapper = UrlHostMapper(suffixes=sdf)
    out = {r["id"]: r["domain"] for r in mapper.map(df).collect()}
    assert out == {0: "b.github.io", 1: "n.co.uk"}
    # the snapshot compiles to in-plan literals: no join, no exchange
    plan = _explain(mapper.map(df))
    assert "Join" not in plan and "Exchange" not in plan, plan


def test_url_mapper_suffixes_validation(spark):
    df = spark.createDataFrame([(0, "https://a.ck/x")], "id long, url string")
    with pytest.raises(ValueError, match="wildcard"):
        UrlHostMapper(suffixes=["*.ck"]).map(df)
    with pytest.raises(ValueError, match="wildcard"):
        UrlHostMapper(suffixes=["!www.ck"]).map(df)
    with pytest.raises(ValueError, match="max_suffix_entries"):
        UrlHostMapper(
            suffixes=[f"s{i}.tld" for i in range(11)],
            max_suffix_entries=10,
        ).map(df)
    two_col = spark.createDataFrame([("a", "b")], "x string, y string")
    with pytest.raises(ValueError, match="exactly one column"):
        UrlHostMapper(suffixes=two_col).map(df)
    # depth-1 entries are accepted no-ops (the default cut covers them)
    out = UrlHostMapper(suffixes=["com"]).map(df).collect()[0]
    assert out["domain"] == "a.ck"


def test_url_mapper_suffixes_bare_string_rejected(spark):
    """Code review r11: a bare string would iterate as characters and
    silently disable all suffix handling."""
    df = spark.createDataFrame([(0, "https://a.co.uk/x")], "id long, url string")
    with pytest.raises(ValueError, match="bare string"):
        UrlHostMapper(suffixes="co.uk").map(df)


def test_url_canonical_rules(spark):
    """r12 UrlCanonicalMapper: each documented normalization on one
    deliberately-ugly case + the passthrough/NULL edges."""
    from smashed_spark.functions.web import UrlCanonicalMapper

    cases = {
        # scheme+host lowercased, :80 dropped, utm_* dropped, params
        # sorted, trailing slash stripped, fragment stripped; path
        # case PRESERVED
        "HTTP://Site.Com:80/A/Path/?utm_source=x&b=2&a=1#frag":
            "http://site.com/A/Path?a=1&b=2",
        "https://site.com:443/": "https://site.com",
        "https://site.com/": "https://site.com",
        "https://site.com": "https://site.com",
        # non-default port kept
        "http://site.com:8080/x/": "http://site.com:8080/x",
        # tracking names dropped with and without '=v'
        "http://a.com/p?fbclid=123": "http://a.com/p",
        "http://a.com/p?fbclid": "http://a.com/p",
        # utm_ prefix family + mixed keepers
        "http://a.com/p?z=1&a=2&utm_campaign=c&gclid=g":
            "http://a.com/p?a=2&z=1",
        # whitespace trim; bare '?' dropped; slash runs collapse
        "  http://a.com/p  ": "http://a.com/p",
        "http://a.com/p?": "http://a.com/p",
        "http://a.com//": "http://a.com",
        # non-http(s) schemes: ports untouched, host still lowered
        "ftp://Host.Com/File": "ftp://host.com/File",
        # RFC-3986 userinfo is case-SENSITIVE: preserved verbatim
        # while the host after it still lowers
        "http://UserA@Site.Com/x": "http://UserA@site.com/x",
        # schemeless passthrough: trim + fragment strip only
        "not a url #frag": "not a url",
    }
    df = spark.createDataFrame(
        [(k,) for k in list(cases) + [None]], "url string"
    )
    got = {
        r["url"]: r["canon_url"]
        for r in UrlCanonicalMapper().map(df).collect()
    }
    for raw, want in cases.items():
        assert got[raw] == want, (raw, got[raw], want)
    assert got[None] is None
    # custom tracking list replaces the default (utm_ family stays)
    one = spark.createDataFrame(
        [("http://a.com/p?sid=1&fbclid=2&utm_x=3",)], "url string"
    )
    r = (
        UrlCanonicalMapper(tracking_params=("sid",))
        .map(one)
        .collect()[0]["canon_url"]
    )
    assert r == "http://a.com/p?fbclid=2"
    import pytest

    with pytest.raises(ValueError, match="bare parameter names"):
        UrlCanonicalMapper(tracking_params=("a=b",))


def test_url_canonical_plan_is_narrow(spark):
    from smashed_spark.functions.web import UrlCanonicalMapper

    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    plan = _explain(UrlCanonicalMapper().map(df))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_url_canonical_duckdb_replay(spark):
    """Cross-engine replay of the full rule chain — the pii_redact
    gate-fold oracle's expression set, pinned here on adversarial
    cases (the gate corpus exercises a narrower mix)."""
    import duckdb

    from smashed_spark.functions.web import (
        _TRACKING_PARAMS,
        UrlCanonicalMapper,
        tracking_drop_regex,
    )

    urls = [
        "HTTP://Site.Com:80/A/Path/?utm_source=x&b=2&a=1#frag",
        "https://site.com:443/?yclid=1&k=v",
        "http://site.com:8080/x/?b=1&a=1&a=0",
        "plain words #tail",
        "ftp://Host.Com:21/File/",
        "http://h.com/p?utm_=x&utm=keepme",
        "https://MixedUser:Pw@Host.COM:443/p/@mention/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["canon_url"]
        for r in UrlCanonicalMapper().map(df).collect()
    }
    drop_re = tracking_drop_regex(_TRACKING_PARAMS)
    con = duckdb.connect()
    sql = f"""
    WITH uc AS (
        SELECT url, trim(regexp_replace(trim(url), '#.*', '')) AS u1
        FROM (SELECT unnest(?) AS url)
    ), up AS (
        SELECT *,
            lower(regexp_extract(u1,
                '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
            regexp_replace(u1,
                '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS after
        FROM uc
    ), uh AS (
        SELECT *,
            regexp_extract(regexp_extract(after, '^([^/?]*)', 1),
                           '^([^@]*@)', 1)
                || lower(regexp_replace(
                       regexp_extract(after, '^([^/?]*)', 1),
                       '^[^@]*@', '')) AS hostport,
            substr(after,
                length(regexp_extract(after, '^([^/?]*)', 1)) + 1)
                AS pathq
        FROM up
    ), uq AS (
        SELECT *,
            regexp_extract(pathq, '^([^?]*)', 1) AS path,
            CASE WHEN contains(pathq, '?')
                 THEN regexp_replace(pathq, '^[^?]*\\?', '')
                 ELSE '' END AS query
        FROM uh
    ), us AS (
        SELECT *, array_to_string(list_sort(list_filter(
            string_split(query, '&'),
            x -> x <> '' AND NOT regexp_matches(x,
                '^(?:{drop_re})(?:=.*)?$'))), '&') AS cq
        FROM uq
    )
    SELECT url,
        CASE WHEN scheme = '' THEN u1 ELSE
            scheme || '://' ||
            CASE WHEN scheme = 'http' AND ends_with(hostport, ':80')
                 THEN substr(hostport, 1, length(hostport) - 3)
                 WHEN scheme = 'https' AND ends_with(hostport, ':443')
                 THEN substr(hostport, 1, length(hostport) - 4)
                 ELSE hostport END ||
            regexp_replace(path, '/+$', '') ||
            CASE WHEN cq <> '' THEN '?' || cq ELSE '' END
        END AS canon_url
    FROM us
    """
    for url, canon in con.execute(sql, [urls]).fetchall():
        assert got[url] == canon, (url, got[url], canon)
