"""URL canonicalization (operators/urls.py)."""

from gstored_spark.operators.urls import normalize_url, url_parts


def test_url_parts_and_normalization(spark):
    rows = [
        (1, "HTTPS://Site.COM:443/a/b?b=2&a=1#frag"),
        (2, "http://site.com:80"),
        (3, "http://site.com:8080/x?z=1"),
        (4, "https://sub.deep.example.org/p"),
        (5, "not a url"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    got = {r["doc_id"]: r for r in normalize_url(df).collect()}
    # case, default port, fragment, param order all canonicalize away
    assert got[1]["url_norm"] == "https://site.com/a/b?a=1&b=2"
    # empty path -> '/', default :80 stripped
    assert got[2]["url_norm"] == "http://site.com/"
    # non-default port survives
    assert got[3]["url_norm"] == "http://site.com:8080/x?z=1"
    assert got[4]["domain"] == "example.org"
    assert got[4]["host_norm"] == "sub.deep.example.org"
    # non-URL rows parse to empty components, norm is the degenerate '://'
    assert got[5]["host_norm"] == ""

    parts = {r["doc_id"]: r for r in url_parts(df).collect()}
    assert parts[1]["scheme"] == "HTTPS" and parts[1]["port"] == "443"
    assert parts[1]["query"] == "b=2&a=1" and parts[1]["fragment"] == "frag"


def test_same_page_two_spellings_one_key(spark):
    df = spark.createDataFrame(
        [(1, "HTTPS://A.com:443/x?b=2&a=1#top"), (2, "https://a.com/x?a=1&b=2")],
        "doc_id int, url string",
    )
    keys = {r["url_norm"] for r in normalize_url(df).collect()}
    assert len(keys) == 1


def test_unparseable_urls_keep_distinct_keys(spark):
    """URLs the anchored regex rejects (IPv6 host, missing scheme) fall
    back to the raw URL as url_norm — they must not collapse to one
    shared ':///' key."""
    from gstored_spark.operators.urls import normalize_url

    rows = [
        (1, "http://[2001:db8::1]/x"),
        (2, "http://[2001:db8::2]/x"),
        (3, "site.com/no-scheme"),
        (4, "https://ok.example.com/a"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    got = {r["doc_id"]: r for r in normalize_url(df).collect()}
    assert got[1]["url_norm"] == "http://[2001:db8::1]/x"
    assert got[1]["host_norm"] == "" and got[1]["domain"] == ""
    assert got[2]["url_norm"] == "http://[2001:db8::2]/x"
    assert got[3]["url_norm"] == "site.com/no-scheme"
    assert got[4]["url_norm"] == "https://ok.example.com/a"
    assert len({r["url_norm"] for r in got.values()}) == 4
