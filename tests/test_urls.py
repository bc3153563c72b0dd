"""URL identity / validity / depth-recurrence parity vs the reference."""

import hypothesis.strategies as st
from hypothesis import given, settings

from spacetime_crawler4_spark.functions.urls import (
    DEFAULT_DOMAIN_WHITELIST,
    child_depths,
    get_urlhash,
    is_valid_url,
    normalize_url,
    rel_dirdepth,
)

# is_valid cases repaired from reference test/test_scraper.py (which imports
# a missing module and never ran); semantics per scraper2.py:69-109
VALID_CASES = [
    ("http://www.ics.uci.edu/", True),
    ("https://www.cs.uci.edu/some/path", True),
    ("http://www.informatics.uci.edu/page?q=1", True),
    ("https://www.stat.uci.edu/a/b/c", True),
    ("ftp://www.ics.uci.edu/", False),  # scheme
    ("http://www.google.com/", False),  # off-whitelist
    ("http://www.ics.uci.edu/file.pdf", False),  # extension
    ("http://www.ics.uci.edu/img.PNG", False),  # lowercased path check
    ("http://www.ics.uci.edu/archive.tar.gz", False),
    ("http://vision.ics.uci.edu/papers.php", True),
    ("http://www.ics.uci.edu/download?file=paper.pdf", True),  # ext in query only
]


def test_is_valid_table():
    for url, expected in VALID_CASES:
        assert is_valid_url(url) == expected, url


def test_is_valid_nonstrict():
    assert is_valid_url("http://example.com/x", whitelist=None)
    assert not is_valid_url("http://example.com/x.zip", whitelist=None)


_path = st.lists(
    st.text(alphabet="abcz019-_", min_size=1, max_size=5), max_size=4
).map(lambda parts: "/" + "/".join(parts))
_url = st.builds(
    lambda scheme, host, path, q, frag, slash: f"{scheme}://{host}{path}"
    + (f"?{q}" if q else "")
    + (f"#{frag}" if frag else "")
    + ("/" if slash else ""),
    st.sampled_from(["http", "https"]),
    st.sampled_from(["a.test", "b.test", "deep.a.test", "x.ics.uci.edu"]),
    _path,
    st.text(alphabet="abc=&1", max_size=6),
    st.text(alphabet="xy2", max_size=4),
    st.booleans(),
)


@settings(max_examples=200, deadline=None)
@given(_url)
def test_urlhash_normalize_differential(ref, url):
    assert normalize_url(url) == ref.normalize(url)
    assert get_urlhash(normalize_url(url)) == ref.get_urlhash(ref.normalize(url))


def test_scheme_excluded_from_urlhash():
    # reference utils/__init__.py:28-30 — http/https twins collapse
    assert get_urlhash("http://a.test/x") == get_urlhash("https://a.test/x")


@settings(max_examples=200, deadline=None)
@given(_url, _url)
def test_rel_dirdepth_differential(ref, child, parent):
    assert rel_dirdepth(child, parent) == ref.compute_rel_dirdepth(child, parent)


@settings(max_examples=200, deadline=None)
@given(_url, _url, st.integers(0, 9), st.integers(0, 3), st.integers(0, 4), st.integers(0, 2))
def test_child_depths_differential(ref, child_url, parent_url, absd, reld, monod, dupd):
    parent_nurl = ref.Nurl(parent_url)
    parent_nurl.absdepth = absd
    parent_nurl.reldepth = reld
    parent_nurl.monodepth = monod
    parent_nurl.dupdepth = dupd
    child_nurl = ref.Nurl(child_url)
    child_nurl.set_parent(parent_nurl)
    got = child_depths(
        child_url,
        parent_url,
        {"absdepth": absd, "reldepth": reld, "monodepth": monod, "dupdepth": dupd},
    )
    assert got == (
        child_nurl.absdepth,
        child_nurl.reldepth,
        child_nurl.monodepth,
        child_nurl.dupdepth,
    )


def test_surt_col_known_vectors(spark):
    from spacetime_crawler4_spark.functions.urls import surt_col
    from pyspark.sql import functions as F

    vectors = [
        ("http://www.Example.test/A/b?z=1&a=2", "test,example,www)/a/b?a=2&z=1"),
        ("https://archive.org/", "org,archive)/"),
        ("http://mega.example-a.test/hub", "test,example-a,mega)/hub"),
        ("http://x.test/p?single=1", "test,x)/p?single=1"),
        # no path, no query
        ("http://a.b.c.test", "test,c,b,a)"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in vectors], "url string")
    got = {
        r.url: r.surt
        for r in df.select("url", surt_col(F.col("url")).alias("surt")).collect()
    }
    for u, want in vectors:
        assert got[u] == want, u


def test_surt_col_matches_duckdb_twin_on_random_urls(spark):
    """Property check: the JVM surt_col and the DuckDB oracle expression
    (queries.SQL_CRAWL_SURT_KEYS' transform) agree byte-for-byte over a
    deterministic randomized URL corpus covering subdomain depth, mixed
    case, query-param permutations, and empty paths/queries."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from spacetime_crawler4_spark.functions.urls import surt_col

    rng = random.Random(1234)
    hosts = ["Example.test", "a.b.Example.test", "x.test", "deep.sub.host.test"]
    paths = ["", "/", "/A/b", "/p0", "/Lad/a/B", "/list"]
    params = ["z=1", "a=2", "UTM_src=x", "id=9", "q=Hash+Join"]
    urls = []
    for _ in range(300):
        scheme = rng.choice(["http", "https"])
        host = rng.choice(hosts)
        path = rng.choice(paths)
        k = rng.randint(0, 3)
        qs = "&".join(rng.sample(params, k)) if k else ""
        urls.append(f"{scheme}://{host}{path}" + (f"?{qs}" if qs else ""))
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: r.surt
        for r in df.select("url", surt_col(F.col("url")).alias("surt")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in urls])
    want = dict(
        con.sql(
            """
WITH p AS (SELECT url,
             regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
           FROM u),
q AS (SELECT url,
             lower(regexp_extract(rest, '^[^/?]*')) AS host,
             lower(regexp_extract(rest, '^[^/?]*([^?]*)', 1)) AS path,
             lower(regexp_extract(rest, '\\?(.*)$', 1)) AS qs
      FROM p)
SELECT url,
       array_to_string(list_reverse(string_split(host, '.')), ',')
       || ')' || path
       || CASE WHEN array_to_string(list_sort(string_split(qs, '&')), '&') = ''
               THEN ''
               ELSE '?' || array_to_string(list_sort(string_split(qs, '&')), '&')
          END AS surt
FROM q
"""
        ).fetchall()
    )
    assert got == want
