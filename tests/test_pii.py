"""PII detection/redaction kernels (ops/pii.py)."""

import pyarrow as pa

from hepcrawl_ray.ops import pii as P


def test_counts_per_pattern():
    col = pa.array([
        "mail a@b.org and c.d+e@f-g.co twice",
        "call 555-123-4567 or 555-000-1111",
        "ssn 123-45-6789 ip 10.0.0.1",
        "nothing here",
        "",
    ])
    c = P.pii_counts(col)
    assert c["n_emails"].tolist() == [2, 0, 0, 0, 0]
    assert c["n_phones"].tolist() == [0, 2, 0, 0, 0]
    assert c["n_ssns"].tolist() == [0, 0, 1, 0, 0]
    assert c["n_ips"].tolist() == [0, 0, 1, 0, 0]


def test_redact_replaces_all():
    col = pa.array(["a@b.org 555-123-4567 123-45-6789 10.0.0.1 ok"])
    out = P.redact(col).to_pylist()
    assert out == ["<EMAIL> <PHONE> <SSN> <IP> ok"]


def test_phone_ssn_do_not_cross_match():
    # 3-3-4 digits is a phone, never an SSN; 3-2-4 the reverse
    col = pa.array(["555-123-4567", "123-45-6789"])
    c = P.pii_counts(col)
    assert c["n_phones"].tolist() == [1, 0]
    assert c["n_ssns"].tolist() == [0, 1]


def test_replacement_tokens_are_inert():
    # a replaced token must not create a later match
    out = P.redact(pa.array(["x@y.org.10.0.0.1"])).to_pylist()[0]
    assert "<" in out and "@" not in out


def test_redact_batch_keeps_columns():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a@b.org", "clean"])})
    out = P.redact_batch(t)
    assert out.column("text").to_pylist() == ["<EMAIL>", "clean"]
    assert out.column("doc_id").to_pylist() == [1, 2]
    assert out.column("n_emails").to_pylist() == [1, 0]
