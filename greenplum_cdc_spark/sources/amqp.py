"""Minimal pure-stdlib AMQP 0-9-1 consumer — the reference's RabbitMQ
transport (rabbitmq.go:95-186) re-expressed for the Spark bus.

The reference's entire ingestion front door is a tiny AMQP consumer:
dial, declare a durable exchange + queue, bind, consume, print each
delivery body as one line, and — per its own TODO (rabbitmq.go:17-19)
and `lastDelivery.Ack(true)` (rabbitmq.go:60-61) — acknowledge ONCE at
the end of the batch with `multiple=true`, after an idle-timeout
`lifetime` says the batch is over. This module reimplements that
contract (not the Go code) against the public AMQP 0-9-1 wire spec:

- frame layer: type(octet) channel(short) size(long) payload 0xCE
- connection class 10: Start/StartOk (PLAIN auth), Tune/TuneOk,
  Open/OpenOk, Close/CloseOk
- channel class 20: Open/OpenOk
- exchange class 40 / queue class 50: Declare(+Bind)/‑Ok
- basic class 60: Consume/ConsumeOk, Deliver (+ content header/body
  frames), Ack

Only the fields the consumer needs are decoded; field tables the
client never reads (server-properties, argument tables) are skipped by
their declared length — the same "ignore what you don't use" stance as
the Go consumer.

Batches land as ONE spool file per drain (written tmp→rename, so the
Spark text file source never sees a partial batch) — the at-least-once
boundary matches the reference: the ack is sent only AFTER the spool
file is durable, so a crash before the ack re-delivers the batch, and
the downstream latest-wins merge (operators/cdc.py) absorbs the
replays. The spool write collapses ``[\\t\\r\\n]+`` to a space exactly
as rabbitmq.go:39,181 does at print time — the spool, like the Go
consumer's stdout, is line-framed, so an embedded newline would split
an envelope; `parse_maxwell`'s uniform sanitize pass is then an
idempotent no-op for this transport.

No broker ships in this sandbox; tests drive the full handshake +
delivery + deferred-ack cycle against an in-process fake broker over a
REAL TCP socket (tests/test_amqp.py), plus golden byte-level frames
hand-derived from the spec so the codec is pinned independently of
itself.
"""

from __future__ import annotations

import os
import re
import socket
import struct
import uuid

FRAME_METHOD = 1
FRAME_HEADER = 2
FRAME_BODY = 3
FRAME_HEARTBEAT = 8
FRAME_END = 0xCE

PROTOCOL_HEADER = b"AMQP\x00\x00\x09\x01"

# (class, method) ids used by the consumer contract
CONNECTION_START = (10, 10)
CONNECTION_START_OK = (10, 11)
CONNECTION_TUNE = (10, 30)
CONNECTION_TUNE_OK = (10, 31)
CONNECTION_OPEN = (10, 40)
CONNECTION_OPEN_OK = (10, 41)
CONNECTION_CLOSE = (10, 50)
CONNECTION_CLOSE_OK = (10, 51)
CHANNEL_OPEN = (20, 10)
CHANNEL_OPEN_OK = (20, 11)
CHANNEL_CLOSE = (20, 40)
CHANNEL_CLOSE_OK = (20, 41)
EXCHANGE_DECLARE = (40, 10)
EXCHANGE_DECLARE_OK = (40, 11)
QUEUE_DECLARE = (50, 10)
QUEUE_DECLARE_OK = (50, 11)
QUEUE_BIND = (50, 20)
QUEUE_BIND_OK = (50, 21)
BASIC_CONSUME = (60, 20)
BASIC_CONSUME_OK = (60, 21)
BASIC_CANCEL = (60, 30)
BASIC_CANCEL_OK = (60, 31)
BASIC_DELIVER = (60, 60)
BASIC_ACK = (60, 80)


class AmqpProtocolError(RuntimeError):
    """Unexpected frame / method during the consumer conversation."""


class AmqpConnectionLost(AmqpProtocolError):
    """The broker dropped the TCP connection (peer close / reset) —
    the RETRIABLE failure class: everything delivered but unacked will
    be REDELIVERED on the next connection (AMQP at-least-once), so the
    caller reconnects and drains again; duplicates are absorbed
    downstream (latest-wins merge / stateful dedup). Subclassed so
    existing best-effort catches still absorb it, while retry loops
    catch it FIRST and leave a genuinely malformed conversation loud."""


class AmqpConsumerCancelled(AmqpProtocolError):
    """The broker cancelled the consumer (Basic.Cancel) and the retry
    budget is exhausted — the drained batch is PARTIAL.  Raised instead
    of returning the partial landed count (ADVICE r9: a silent partial
    return is indistinguishable from a complete drain; the
    connection-lost leg already raises, this leg must too).  Carries
    ``landed`` so callers that can tolerate truncation still know what
    reached the spool (it is acked and will NOT be redelivered)."""

    def __init__(self, landed: int):
        super().__init__(
            f"broker cancelled consumer with retries exhausted; "
            f"{landed} messages landed before the cancel (acked, "
            f"not redelivered) — the batch may be truncated"
        )
        self.landed = landed


# --- wire codec --------------------------------------------------------


def pack_shortstr(s: str) -> bytes:
    b = s.encode("utf-8")
    if len(b) > 255:
        raise ValueError("shortstr > 255 bytes")
    return bytes([len(b)]) + b


def pack_longstr(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def pack_table_empty() -> bytes:
    """An empty field table (the only table the consumer sends)."""
    return struct.pack(">I", 0)


def pack_frame(frame_type: int, channel: int, payload: bytes) -> bytes:
    return (
        struct.pack(">BHI", frame_type, channel, len(payload))
        + payload
        + bytes([FRAME_END])
    )


def pack_method(class_id: int, method_id: int, args: bytes = b"") -> bytes:
    return struct.pack(">HH", class_id, method_id) + args


def pack_method_frame(
    channel: int, class_method: tuple[int, int], args: bytes = b""
) -> bytes:
    return pack_frame(FRAME_METHOD, channel, pack_method(*class_method, args))


def pack_content_header(
    class_id: int, body_size: int, channel: int
) -> bytes:
    """Content header frame with no properties (property-flags 0)."""
    payload = struct.pack(">HHQH", class_id, 0, body_size, 0)
    return pack_frame(FRAME_HEADER, channel, payload)


class _Cursor:
    """Sequential reader over a frame payload."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def octet(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def short(self) -> int:
        (v,) = struct.unpack_from(">H", self.buf, self.pos)
        self.pos += 2
        return v

    def long(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def longlong(self) -> int:
        (v,) = struct.unpack_from(">Q", self.buf, self.pos)
        self.pos += 8
        return v

    def shortstr(self) -> str:
        n = self.octet()
        v = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += n
        return v

    def longstr(self) -> bytes:
        n = self.long()
        v = self.buf[self.pos : self.pos + n]
        self.pos += n
        return v

    def skip_table(self) -> None:
        n = self.long()
        self.pos += n


def unpack_method(payload: bytes) -> tuple[tuple[int, int], _Cursor]:
    cur = _Cursor(payload)
    class_id = cur.short()
    method_id = cur.short()
    return (class_id, method_id), cur


# --- consumer ----------------------------------------------------------


class AmqpConsumer:
    """The rabbitmq.go consumer contract over a blocking socket.

    Same topology parameters as the Go flags (rabbitmq.go:24-31):
    exchange (durable), queue (durable), binding key, consumer tag;
    same batch semantics: drain until `idle_timeout` elapses with no
    delivery, then one multiple-ack for everything received.
    """

    def __init__(
        self,
        host: str = "localhost",
        port: int = 5672,
        vhost: str = "/",
        user: str = "guest",
        password: str = "guest",
        connect_timeout: float = 2.0,
    ):
        self.host, self.port, self.vhost = host, port, vhost
        self.user, self.password = user, password
        self.connect_timeout = connect_timeout
        self.sock: socket.socket | None = None
        self._recv_buf = b""
        self.frame_max = 131072
        # set when the SERVER cancels this consumer mid-drain
        # (RabbitMQ consumer-cancel-notification): the batch so far is
        # still acked normally; the caller must re-subscribe to get
        # the rest (consume_to_spool's retry leg does)
        self.cancelled = False

    # -- frame I/O --

    def _send(self, data: bytes) -> None:
        assert self.sock is not None
        try:
            self.sock.sendall(data)
        except (BrokenPipeError, ConnectionResetError) as e:
            raise AmqpConnectionLost(f"send failed: {e}") from e

    def _fill(self) -> None:
        """One recv() appended to the buffer (may raise socket.timeout
        with the buffer intact — nothing is ever consumed partially)."""
        assert self.sock is not None
        try:
            chunk = self.sock.recv(65536)
        except ConnectionResetError as e:
            raise AmqpConnectionLost(f"recv failed: {e}") from e
        if not chunk:
            raise AmqpConnectionLost("connection closed by peer")
        self._recv_buf += chunk

    def read_frame(self) -> tuple[int, int, bytes]:
        """Read one frame, consuming from the buffer ATOMICALLY: bytes
        leave ``_recv_buf`` only once the whole frame (head + payload +
        frame-end) has arrived, so a socket.timeout mid-frame leaves the
        stream frame-aligned and a later read_frame resumes cleanly
        (ADVICE r5: the old head-then-payload consume desynced the
        parse if a timeout landed between the two)."""
        while len(self._recv_buf) < 7:
            self._fill()
        frame_type, channel, size = struct.unpack(
            ">BHI", self._recv_buf[:7]
        )
        total = 7 + size + 1
        while len(self._recv_buf) < total:
            self._fill()
        frame, self._recv_buf = (
            self._recv_buf[:total],
            self._recv_buf[total:],
        )
        if frame[total - 1] != FRAME_END:
            raise AmqpProtocolError(f"bad frame end {frame[total - 1]!r}")
        return frame_type, channel, frame[7 : total - 1]

    def _expect_method(self, want: tuple[int, int]) -> _Cursor:
        """Read frames until `want` arrives (heartbeats are absorbed)."""
        while True:
            frame_type, _ch, payload = self.read_frame()
            if frame_type == FRAME_HEARTBEAT:
                continue
            if frame_type != FRAME_METHOD:
                raise AmqpProtocolError(
                    f"expected method frame, got type {frame_type}"
                )
            got, cur = unpack_method(payload)
            if got == CONNECTION_CLOSE:
                code = cur.short()
                text = cur.shortstr()
                raise AmqpProtocolError(f"server closed: {code} {text}")
            if got != want:
                raise AmqpProtocolError(f"expected {want}, got {got}")
            return cur

    # -- conversation --

    def connect(self) -> None:
        """Dial + Start/Tune/Open — rabbitmq.go NewConsumer's Dial leg."""
        try:
            self.sock = socket.create_connection(
                (self.host, self.port), timeout=self.connect_timeout
            )
        except OSError as e:
            raise ConnectionError(
                f"rabbitmq broker unreachable at {self.host}:{self.port} "
                f"({e}) — start a broker or use the 'rabbitmq-double' "
                "bus kind"
            ) from e
        self._send(PROTOCOL_HEADER)
        cur = self._expect_method(CONNECTION_START)
        cur.octet()  # version-major
        cur.octet()  # version-minor
        cur.skip_table()  # server-properties: unused, skipped by length
        mechanisms = cur.longstr()
        if b"PLAIN" not in mechanisms:
            raise AmqpProtocolError(f"no PLAIN auth in {mechanisms!r}")
        plain = f"\x00{self.user}\x00{self.password}".encode()
        self._send(
            pack_method_frame(
                0,
                CONNECTION_START_OK,
                pack_table_empty()
                + pack_shortstr("PLAIN")
                + pack_longstr(plain)
                + pack_shortstr("en_US"),
            )
        )
        cur = self._expect_method(CONNECTION_TUNE)
        channel_max = cur.short()
        frame_max = cur.long()
        heartbeat = cur.short()
        self.frame_max = frame_max or self.frame_max
        self._send(
            pack_method_frame(
                0,
                CONNECTION_TUNE_OK,
                struct.pack(">HIH", channel_max, self.frame_max, heartbeat),
            )
        )
        self._send(
            pack_method_frame(
                0,
                CONNECTION_OPEN,
                pack_shortstr(self.vhost) + pack_shortstr("") + b"\x00",
            )
        )
        self._expect_method(CONNECTION_OPEN_OK)
        self._send(pack_method_frame(1, CHANNEL_OPEN, pack_shortstr("")))
        self._expect_method(CHANNEL_OPEN_OK)

    def declare(
        self,
        exchange: str = "test-exchange",
        exchange_type: str = "direct",
        queue: str = "test-queue",
        binding_key: str = "test-key",
    ) -> None:
        """Durable exchange + durable queue + bind — rabbitmq.go:103-140
        (same durable/auto-delete choices as the Go consumer)."""
        # bits octet: passive=0 durable=1 auto-delete=0 internal=0 nowait=0
        self._send(
            pack_method_frame(
                1,
                EXCHANGE_DECLARE,
                struct.pack(">H", 0)
                + pack_shortstr(exchange)
                + pack_shortstr(exchange_type)
                + b"\x02"
                + pack_table_empty(),
            )
        )
        self._expect_method(EXCHANGE_DECLARE_OK)
        self._send(
            pack_method_frame(
                1,
                QUEUE_DECLARE,
                struct.pack(">H", 0)
                + pack_shortstr(queue)
                + b"\x02"  # durable=1 (rabbitmq.go:116)
                + pack_table_empty(),
            )
        )
        cur = self._expect_method(QUEUE_DECLARE_OK)
        cur.shortstr()  # queue name
        self._send(
            pack_method_frame(
                1,
                QUEUE_BIND,
                struct.pack(">H", 0)
                + pack_shortstr(queue)
                + pack_shortstr(exchange)
                + pack_shortstr(binding_key)
                + b"\x00"
                + pack_table_empty(),
            )
        )
        self._expect_method(QUEUE_BIND_OK)

    def consume(
        self, queue: str = "test-queue", consumer_tag: str = "simple-consumer"
    ) -> None:
        """Basic.Consume with explicit acks (noAck=false, like
        rabbitmq.go:143-151) — the deferred-ack contract depends on it."""
        self.cancelled = False
        self._send(
            pack_method_frame(
                1,
                BASIC_CONSUME,
                struct.pack(">H", 0)
                + pack_shortstr(queue)
                + pack_shortstr(consumer_tag)
                + b"\x00"  # no-local=0 no-ack=0 exclusive=0 nowait=0
                + pack_table_empty(),
            )
        )
        self._expect_method(BASIC_CONSUME_OK)

    def drain(
        self,
        idle_timeout: float = 0.1,
        before_ack=None,
        content_timeout: float = 5.0,
    ) -> list[bytes]:
        """Consume until `idle_timeout` passes with no delivery, then
        ack EVERYTHING with one multiple-ack — the Go main loop's
        `lifetime` + `lastDelivery.Ack(true)` batch framing
        (rabbitmq.go:54-61). Returns the raw delivery bodies in order.

        ``before_ack(bodies)`` (if given) runs after the batch is
        complete but BEFORE the ack is sent — the hook where the spool
        write lands the batch durably, preserving the reference's
        ack-after-land at-least-once ordering.

        If the broker drops the connection MID-batch, the partial
        batch is still landed through ``before_ack`` (the ack can no
        longer go out, so the broker will redeliver every unacked
        message on the next connection) and AmqpConnectionLost is
        raised so the caller can reconnect — the land-before-ack
        at-least-once contract, exercised end-to-end by the
        subprocess-broker reconnect pytest.

        Timeout discipline (ADVICE r5): the short ``idle_timeout`` is
        armed ONLY while waiting for the next Basic.Deliver method
        frame with an empty buffer — "no new deliveries" is the batch
        boundary. Once any frame bytes are in flight (mid-frame) or a
        delivery's content frames are pending, the socket gets the
        longer ``content_timeout``: a header/body frame arriving slower
        than the delivery gap is not idleness, and only a genuinely
        stalled peer (> content_timeout mid-message) raises — as a
        loud AmqpProtocolError, never a silent empty batch.
        """
        assert self.sock is not None
        bodies: list[bytes] = []
        self.sock.settimeout(idle_timeout)
        try:
            last_tag = self._drain_loop(bodies, idle_timeout, content_timeout)
        except AmqpConnectionLost:
            # the broker died mid-batch: land what arrived (the ack
            # can never go out, so the broker will REDELIVER these —
            # at-least-once, land-before-ack ordering preserved), then
            # surface the loss so the caller can reconnect
            if before_ack is not None and bodies:
                before_ack(bodies)
            raise
        finally:
            try:
                self.sock.settimeout(None)
            except OSError:
                pass
        if before_ack is not None:
            before_ack(bodies)
        if last_tag:
            # ack after the batch landed — deferred, multiple=true
            self._send(
                pack_method_frame(
                    1,
                    BASIC_ACK,
                    struct.pack(">Q", last_tag) + b"\x01",
                )
            )
        return bodies

    def _drain_loop(
        self,
        bodies: list[bytes],
        idle_timeout: float,
        content_timeout: float,
    ) -> int:
        """Inner read loop of ``drain``, appending into ``bodies`` as
        deliveries complete (split out so the connection-lost handler
        can land the partial batch). Returns the last delivery tag."""
        last_tag = 0
        while True:
            try:
                frame_type, _ch, payload = self.read_frame()
            except socket.timeout:
                if not self._recv_buf:
                    break  # idle between deliveries: batch over
                # mid-frame: the peer started a frame — give it
                # the content deadline to finish (read_frame
                # consumes atomically, so the buffer is aligned)
                self.sock.settimeout(content_timeout)
                try:
                    frame_type, _ch, payload = self.read_frame()
                except socket.timeout:
                    raise AmqpProtocolError(
                        "peer stalled mid-frame for "
                        f"{content_timeout}s"
                    ) from None
                finally:
                    self.sock.settimeout(idle_timeout)
            if frame_type == FRAME_HEARTBEAT:
                continue
            if frame_type != FRAME_METHOD:
                raise AmqpProtocolError(
                    f"expected Basic.Deliver, got frame {frame_type}"
                )
            got, cur = unpack_method(payload)
            if got == BASIC_CANCEL:
                # server-initiated consumer cancel (RabbitMQ
                # consumer-cancel-notification, e.g. queue deleted or
                # rebalanced): reply Cancel-Ok unless nowait, end the
                # batch — deliveries so far are still valid and get
                # acked normally on the still-open channel; the caller
                # re-subscribes for the remainder (consume_to_spool's
                # retry leg; no duplicates, the ack stuck)
                ctag = cur.shortstr()
                nowait = cur.octet()
                if not nowait:
                    self._send(
                        pack_method_frame(
                            1, BASIC_CANCEL_OK, pack_shortstr(ctag)
                        )
                    )
                self.cancelled = True
                break
            if got == CHANNEL_CLOSE:
                # server closed the channel mid-conversation (e.g. a
                # precondition failure racing the deferred ack): reply
                # Close-Ok per spec, then surface the RETRIABLE loss —
                # any in-flight ack on this channel is void, so
                # everything unacked redelivers on the next connection
                # (at-least-once; downstream dedup absorbs it)
                code = cur.short()
                text = cur.shortstr()
                self._send(pack_method_frame(1, CHANNEL_CLOSE_OK))
                raise AmqpConnectionLost(
                    f"channel closed by server: {code} {text}"
                )
            if got != BASIC_DELIVER:
                raise AmqpProtocolError(f"expected Deliver, got {got}")
            cur.shortstr()  # consumer-tag
            last_tag = cur.longlong()  # delivery-tag
            # redelivered bit / exchange / routing-key: not needed.
            # Content frames get the longer deadline: they belong
            # to a delivery already in progress.
            self.sock.settimeout(content_timeout)
            try:
                body = self._read_content()
            except socket.timeout:
                raise AmqpProtocolError(
                    "peer stalled mid-message for "
                    f"{content_timeout}s"
                ) from None
            finally:
                self.sock.settimeout(idle_timeout)
            bodies.append(body)
        return last_tag

    def _read_content(self) -> bytes:
        """Content header frame + as many body frames as it declares."""
        frame_type, _ch, payload = self.read_frame()
        if frame_type != FRAME_HEADER:
            raise AmqpProtocolError(f"expected content header, got {frame_type}")
        cur = _Cursor(payload)
        cur.short()  # class-id
        cur.short()  # weight
        body_size = cur.longlong()
        body = b""
        while len(body) < body_size:
            frame_type, _ch, chunk = self.read_frame()
            if frame_type != FRAME_BODY:
                raise AmqpProtocolError(f"expected body frame, got {frame_type}")
            body += chunk
        return body

    def close(self) -> None:
        if self.sock is None:
            return
        try:
            self._send(
                pack_method_frame(
                    0,
                    CONNECTION_CLOSE,
                    struct.pack(">H", 200)
                    + pack_shortstr("bye")
                    + struct.pack(">HH", 0, 0),
                )
            )
            self._expect_method(CONNECTION_CLOSE_OK)
        except (OSError, AmqpProtocolError):
            pass  # best-effort, like the Go Shutdown error path
        finally:
            self.sock.close()
            self.sock = None


def consume_to_spool(
    spool_dir: str,
    host: str = "localhost",
    port: int = 5672,
    exchange: str = "test-exchange",
    exchange_type: str = "direct",
    queue: str = "test-queue",
    binding_key: str = "test-key",
    consumer_tag: str = "simple-consumer",
    idle_timeout: float = 0.1,
    retries: int = 0,
    retry_delay: float = 0.2,
    **conn_opts,
) -> int:
    """One full reference-consumer cycle: connect → declare → consume →
    drain (spooling the batch atomically tmp→rename BEFORE the deferred
    ack goes out) → close. Returns the number of lines landed.

    ``retries`` > 0 adds the reconnect leg (round 8): when the broker
    drops the connection mid-batch (AmqpConnectionLost), the partial
    batch has already been landed by ``drain``'s land-before-ack
    contract; this loop dials again after ``retry_delay`` and drains
    the REDELIVERED batch — so the spool may contain duplicates of the
    partial batch, which is exactly AMQP's at-least-once promise.
    Downstream dedup (latest-wins merge / stream_dedup) absorbs them;
    the reconnect pytest pins both the duplication and the absorption.
    A dial failure on a retry attempt keeps retrying (broker restart);
    a dial failure on the FIRST attempt still raises ConnectionError
    immediately (no broker at all — the env-gated skip path).

    A Basic.Cancel from the broker with the retry budget exhausted
    raises AmqpConsumerCancelled (carrying the landed count) rather
    than returning the partial count as if the drain were complete.
    """
    import time

    landed = {"n": 0}

    def _land(bodies: list[bytes]) -> None:
        os.makedirs(spool_dir, exist_ok=True)
        if not bodies:
            return
        tmp = os.path.join(spool_dir, f".batch-{uuid.uuid4().hex}.tmp")
        final = os.path.join(spool_dir, os.path.basename(tmp)[1:-4] + ".txt")
        # rabbitmq.go:39,181 — collapse [\t\r\n]+ to one space AT the
        # consumer: the spool (like the Go consumer's stdout) is
        # line-framed, so an embedded newline would split an envelope.
        # parse_maxwell's sanitize_line is then an idempotent no-op.
        sane = [re.sub(rb"[\t\r\n]+", b" ", b) for b in bodies]
        with open(tmp, "wb") as f:
            f.write(b"\n".join(sane) + b"\n")
        os.replace(tmp, final)
        landed["n"] += len(bodies)

    attempt = 0
    ever_connected = False
    while True:
        consumer = AmqpConsumer(host=host, port=port, **conn_opts)
        try:
            consumer.connect()
            ever_connected = True
            consumer.declare(exchange, exchange_type, queue, binding_key)
            consumer.consume(queue, consumer_tag)
            consumer.drain(idle_timeout, before_ack=_land)
            if consumer.cancelled:
                if attempt < retries:
                    # server cancelled the consumer mid-batch: the
                    # landed portion is ACKED (channel stayed open), so
                    # a fresh subscribe cycle picks up ONLY the
                    # remainder — no duplicates, unlike the
                    # connection-lost leg below
                    attempt += 1
                    time.sleep(retry_delay)
                    continue
                # retries exhausted (incl. the default retries=0): the
                # batch is truncated — surface it like the
                # connection-lost leg does, never a silent partial
                # return (ADVICE r9)
                raise AmqpConsumerCancelled(landed["n"])
            return landed["n"]
        except AmqpConnectionLost:
            if attempt >= retries:
                raise
            attempt += 1
            time.sleep(retry_delay)
        except ConnectionError:
            # dial failure: retry only if a broker ever answered (it
            # may be restarting); a broker that was never there stays
            # an immediate, loud ConnectionError (the env-gated skip)
            if not ever_connected or attempt >= retries:
                raise
            attempt += 1
            time.sleep(retry_delay)
        finally:
            consumer.close()
