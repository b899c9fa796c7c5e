"""Prometheus remote-write sink (SURVEY.md §2.1 S8).

The reference marshals TimeSeries into a prompb WriteRequest, snappy-
compresses it, and POSTs with SigV4 signing and remote-write-0.1.0 headers
(collector/internal/utils/prometheus.go:122-167). The protocol is public
(Prometheus remote-write 1.0 spec).

Spark-first shape: ``df.foreachPartition(writer)`` for batch,
``foreachBatch`` for streaming — each executor partition encodes and ships
its own payload, so the sink scales with the cluster instead of funneling
through the driver. Payloads are chunked at ``max_samples_per_request``
because APS-class endpoints cap request sizes.

Wire-format notes (hand-rolled here so no protobuf toolchain is needed):
a WriteRequest is `repeated TimeSeries timeseries = 1`; a TimeSeries is
`repeated Label labels = 1; repeated Sample samples = 2`; a Label is two
strings (fields 1, 2); a Sample is `double value = 1; int64 timestamp = 2`.
All length-delimited fields use varint lengths — ~40 lines of pure Python,
Arrow-batch friendly, zero dependencies.

Transport dependencies (snappy, botocore for SigV4, requests) are gated
behind import-try: encoding is always testable; network pushes require the
libs and are exercised against a local HTTP sink in tests.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

try:  # transport extras — absent in this container; encoding never needs them
    import snappy  # type: ignore
except Exception:  # pragma: no cover
    snappy = None

try:
    import botocore.auth  # type: ignore
    import botocore.awsrequest  # type: ignore
    import botocore.session  # type: ignore
except Exception:  # pragma: no cover
    botocore = None


# --- minimal protobuf writer (public prompb schema) ------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_delim(field_no: int, payload: bytes) -> bytes:
    return _varint((field_no << 3) | 2) + _varint(len(payload)) + payload


def _encode_label(name: str, value: str) -> bytes:
    return _len_delim(1, name.encode()) + _len_delim(2, value.encode())


def _encode_sample(value: float, timestamp_ms: int) -> bytes:
    # Sample: double value = 1 (fixed64); int64 timestamp = 2 (varint)
    body = bytes([(1 << 3) | 1]) + struct.pack("<d", value)
    body += bytes([(2 << 3) | 0]) + _varint(timestamp_ms & 0xFFFFFFFFFFFFFFFF)
    return body


def encode_timeseries(labels: dict[str, str], value: float, timestamp_ms: int) -> bytes:
    """One prompb.TimeSeries message body.

    Labels are sorted by name — required by the remote-write spec and what
    the upstream Go client does before marshalling.
    """
    body = b"".join(
        _len_delim(1, _encode_label(k, v)) for k, v in sorted(labels.items())
    )
    body += _len_delim(2, _encode_sample(value, timestamp_ms))
    return body


def encode_write_request(series: list[tuple[dict[str, str], float, int]]) -> bytes:
    """prompb.WriteRequest bytes for [(labels, value, ts_ms), ...]."""
    return b"".join(
        _len_delim(1, encode_timeseries(labels, value, ts_ms))
        for labels, value, ts_ms in series
    )


# --- decoding (test/golden support) ----------------------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def decode_write_request(buf: bytes) -> list[tuple[dict[str, str], float, int]]:
    """Inverse of encode_write_request — used by the golden tests to diff
    produced payloads structurally instead of byte-blindly."""
    series = []
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        assert tag == (1 << 3) | 2, f"unexpected tag {tag}"
        ln, i = _read_varint(buf, i)
        ts_buf = buf[i : i + ln]
        i += ln
        labels: dict[str, str] = {}
        value = 0.0
        ts_ms = 0
        j = 0
        while j < len(ts_buf):
            tag2, j = _read_varint(ts_buf, j)
            ln2, j = _read_varint(ts_buf, j)
            payload = ts_buf[j : j + ln2]
            j += ln2
            if tag2 >> 3 == 1:  # label
                k = 0
                nm = val = ""
                while k < len(payload):
                    t3, k = _read_varint(payload, k)
                    l3, k = _read_varint(payload, k)
                    s = payload[k : k + l3].decode()
                    k += l3
                    if t3 >> 3 == 1:
                        nm = s
                    else:
                        val = s
                labels[nm] = val
            else:  # sample
                k = 0
                while k < len(payload):
                    t3, k = _read_varint(payload, k)
                    if t3 == (1 << 3) | 1:
                        (value,) = struct.unpack("<d", payload[k : k + 8])
                        k += 8
                    else:
                        ts_ms, k = _read_varint(payload, k)
        series.append((labels, value, ts_ms))
    return series


# --- the sink ---------------------------------------------------------------


class RemoteWriteSink:
    """foreachPartition / foreachBatch writer.

    Instances are pickled to executors, so construction takes only plain
    config; sessions/clients are created lazily per partition.
    """

    def __init__(
        self,
        url: str,
        *,
        region: str = "us-west-2",
        sign_sigv4: bool = True,
        max_samples_per_request: int = 10_000,
        max_retries: int = 3,
        transport=None,
    ) -> None:
        self.url = url
        self.region = region
        self.sign_sigv4 = sign_sigv4
        self.max_samples = max_samples_per_request
        # the reference has NO retry (prometheus.go:160-164 just errors);
        # we default to bounded retries — set 0 for behavior parity
        self.max_retries = max_retries
        self.transport = transport  # injectable for tests

    # rows: (labels: dict, value: float, ts: datetime)
    def __call__(self, rows: Iterator) -> None:
        batch: list[tuple[dict[str, str], float, int]] = []
        for row in rows:
            labels, value, ts = row["labels"], row["value"], row["ts"]
            ts_ms = int(ts.timestamp() * 1000)
            batch.append((dict(labels), float(value), ts_ms))
            if len(batch) >= self.max_samples:
                self._push(batch)
                batch = []
        if batch:
            self._push(batch)

    def _push(self, series: list[tuple[dict[str, str], float, int]]) -> None:
        payload = encode_write_request(series)
        headers = {
            # parity with prometheus.go:151-153
            "Content-Type": "application/x-protobuf",
            "X-Prometheus-Remote-Write-Version": "0.1.0",
        }
        if snappy is not None:
            # the spec requires snappy; without the lib (not in this
            # container) the payload ships uncompressed and honestly labeled
            payload = snappy.compress(payload)
            headers["Content-Encoding"] = "snappy"
        else:
            headers["Content-Encoding"] = "identity"
        if self.sign_sigv4:
            headers.update(self._sigv4_headers(payload))
        send = self.transport or self._http_post
        last_err: Exception | None = None
        for _ in range(max(1, self.max_retries)):
            try:
                status = send(self.url, payload, headers)
                if 200 <= status < 300:
                    return
                last_err = RuntimeError(f"remote write failed: HTTP {status}")
            except Exception as e:  # pragma: no cover - network path
                last_err = e
        raise last_err  # non-2xx -> error, as prometheus.go:160-164

    def _sigv4_headers(self, payload: bytes) -> dict[str, str]:
        if botocore is None:
            raise NotImplementedError(
                "SigV4 signing requires botocore; pass sign_sigv4=False or "
                "install botocore (public AWS auth, prometheus.go:145-149)"
            )
        session = botocore.session.get_session()
        creds = session.get_credentials()
        req = botocore.awsrequest.AWSRequest(
            method="POST", url=self.url, data=payload
        )
        botocore.auth.SigV4Auth(creds, "aps", self.region).add_auth(req)
        return dict(req.headers)

    @staticmethod
    def _http_post(url: str, payload: bytes, headers: dict[str, str]) -> int:
        import urllib.request

        req = urllib.request.Request(url, data=payload, headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=30) as resp:  # pragma: no cover
            return resp.status


def write_batch(df, sink: RemoteWriteSink) -> None:
    """Batch entry: enriched TimeSeries frame -> remote write, one payload
    stream per partition (the distributed analog of one-POST-per-target,
    prometheus.go:131-167)."""
    df.foreachPartition(sink)
