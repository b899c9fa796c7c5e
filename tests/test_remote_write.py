"""Remote-write sink: prompb encode/decode + partition writer semantics."""

from __future__ import annotations

import datetime as dt

import pytest

from database_collector_spark.sinks.remote_write import (
    RemoteWriteSink,
    decode_write_request,
    encode_write_request,
)


def test_roundtrip():
    series = [
        ({"__name__": "up", "job": "database-collector"}, 1.0, 1717200000000),
        ({"__name__": "latency", "quantile": "0.99"}, 0.25, 1717200300000),
    ]
    decoded = decode_write_request(encode_write_request(series))
    assert decoded == series


def test_labels_sorted_on_wire():
    payload = encode_write_request([({"z": "1", "a": "2"}, 0.0, 0)])
    # label 'a' must be marshalled before 'z' (remote-write spec ordering)
    assert payload.index(b"a") < payload.index(b"z")


class _Transport:
    def __init__(self, statuses):
        self.statuses = list(statuses)
        self.calls = []

    def __call__(self, url, payload, headers):
        self.calls.append((url, payload, dict(headers)))
        return self.statuses.pop(0)


def _rows(n):
    ts = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
    return [
        {"labels": {"__name__": "m", "i": str(i)}, "value": float(i), "ts": ts}
        for i in range(n)
    ]


def test_sink_pushes_with_headers():
    t = _Transport([200])
    sink = RemoteWriteSink("http://aps.local/write", sign_sigv4=False, transport=t)
    sink(iter(_rows(3)))
    assert len(t.calls) == 1
    _, payload, headers = t.calls[0]
    assert headers["Content-Type"] == "application/x-protobuf"
    assert headers["X-Prometheus-Remote-Write-Version"] == "0.1.0"
    # snappy when available, honestly-labeled identity otherwise
    from database_collector_spark.sinks import remote_write as rw

    expected = "snappy" if rw.snappy is not None else "identity"
    assert headers["Content-Encoding"] == expected
    if rw.snappy is None:
        assert decode_write_request(payload)[0][0]["__name__"] == "m"


def test_sink_chunks_large_partitions():
    t = _Transport([200, 200, 200])
    sink = RemoteWriteSink(
        "http://aps.local/write",
        sign_sigv4=False,
        transport=t,
        max_samples_per_request=2,
    )
    sink(iter(_rows(5)))
    assert len(t.calls) == 3  # 2+2+1


def test_sink_retries_then_raises():
    t = _Transport([500, 500, 500])
    sink = RemoteWriteSink(
        "http://aps.local/write", sign_sigv4=False, transport=t, max_retries=3
    )
    with pytest.raises(RuntimeError, match="HTTP 500"):
        sink(iter(_rows(1)))
    assert len(t.calls) == 3


def test_compat_no_retry_mode():
    """Reference parity: non-200 is an immediate error (prometheus.go:160-164)."""
    t = _Transport([503])
    sink = RemoteWriteSink(
        "http://aps.local/write", sign_sigv4=False, transport=t, max_retries=0
    )
    with pytest.raises(RuntimeError):
        sink(iter(_rows(1)))
    assert len(t.calls) == 1
