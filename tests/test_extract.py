"""Extraction: byte-identity per url between the Arrow UDF and the pure
reference function (BASELINE.json input_hint per-row invariant)."""

from pyspark.sql import functions as F

from gstored_spark.kg.extract import extract_text, extract_text_udf, extracted


def test_extract_byte_identity_per_url(spark, docs200):
    via_udf = docs200.select(
        "url", extract_text_udf(F.col("html")).alias("t_udf")
    ).collect()
    html_by_url = {r["url"]: bytes(r["html"]) for r in docs200.select("url", "html").collect()}
    assert len(via_udf) == 200
    for r in via_udf:
        ref = extract_text(html_by_url[r["url"]])
        assert r["t_udf"] == ref, f"extraction mismatch for {r['url']}"
        assert r["t_udf"].encode("utf-8") == ref.encode("utf-8")


def test_extract_drops_boilerplate():
    html = (
        b"<html><head><title>T</title><style>x{}</style></head><body>"
        b"<nav><a href='/'>home</a></nav><header>hdr</header>"
        b"<p>Keep &amp; hold this.</p><p>Second   para.</p>"
        b"<script>var a=1;</script><footer>foot</footer></body></html>"
    )
    assert extract_text(html) == "Keep & hold this.\nSecond para."


def test_extract_handles_malformed_bytes():
    assert extract_text(b"<p>ok \xff\xfe</p>") == "ok ��"
    assert extract_text(None) is None
    assert extract_text(b"") == ""


def test_extracted_prefers_existing_text(spark, docs200):
    # rows with pre-filled text must pass through byte-identical, and every
    # en row must end up with non-null text
    out = extracted(docs200)
    rows = out.select("url", "text", "lang").collect()
    assert all(r["lang"] == "en" for r in rows)
    assert all(r["text"] for r in rows)
    pre = {
        r["url"]: r["text"]
        for r in docs200.filter(F.col("text").isNotNull()).select("url", "text").collect()
    }
    for r in rows:
        if r["url"] in pre:
            assert r["text"] == pre[r["url"]]
