"""PII redaction (operators/redact.py)."""

from gstored_spark.operators.redact import redact_pii


def test_redact_patterns_and_counts(spark):
    rows = [
        (1, "mail a.b+c@sub.example.org or x@y.co"),
        (2, "server 192.168.0.1 and 10.0.0.255 up"),
        (3, "call +1 555-123-4567 or 555.987.6543 now"),
        (4, "clean text, no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["n_email"] == 2 and got[1]["redacted"] == "mail <EMAIL> or <EMAIL>"
    assert got[2]["n_ip"] == 2 and got[2]["redacted"] == "server <IP> and <IP> up"
    assert got[3]["n_phone"] == 2
    assert "<PHONE>" in got[3]["redacted"] and "555" not in got[3]["redacted"]
    assert got[4]["redacted"] == rows[3][1]
    assert (got[4]["n_email"], got[4]["n_ip"], got[4]["n_phone"]) == (0, 0, 0)


def test_email_redacts_before_ip_can_eat_digits(spark):
    df = spark.createDataFrame([(1, "u1.2.3.4@host.com")], "doc_id int, text string")
    (r,) = redact_pii(df).collect()
    assert r["redacted"] == "<EMAIL>"
