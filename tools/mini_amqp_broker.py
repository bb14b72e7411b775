"""Subprocess mini AMQP 0-9-1 broker — the OUT-OF-PROCESS test seam
for the `rabbitmq` bus kind (VERDICT r7 item 6).

The in-process FakeBroker (tests/test_amqp.py) proves the consumer's
frame codec over a real TCP socket but shares the consumer's process
and lifetime. This broker runs as its OWN OS process (spawned via
``subprocess``), so the test exercises the seams an in-process thread
cannot: process-separate socket lifecycles, abrupt RST/FIN from a peer
the test cannot reach into, and RECONNECT against a listener that
outlives the first connection.

Speaks just enough server-side AMQP for the reference consumer
contract (rabbitmq.go:95-186): Start/Tune/Open, Channel.Open,
Exchange/Queue Declare + Bind, Basic.Consume → Deliver (content
header + body frames), Basic.Ack (multiple), Connection.Close. Frame
packing reuses the consumer module's codec helpers — the spec-pinned
golden-frame tests in tests/test_amqp.py keep that codec honest
independently of this broker.

Fault model (`--drop-after N`): on the FIRST connection the broker
delivers N messages, then hard-closes the socket WITHOUT waiting for
the ack — the classic broker-restart-mid-batch. State is the real
AMQP rule: messages are forgotten only when ACKED, so the next
connection redelivers EVERYTHING unacked with the redelivered flag
set. A consumer that landed its partial batch before the drop will
therefore see duplicates — at-least-once, exactly what downstream
dedup must absorb.

Usage (the test does this via subprocess.Popen):

    python tools/mini_amqp_broker.py --port 0 --messages msgs.txt \
        [--drop-after N] [--max-conns K]

Prints ``READY <port>`` on stdout once listening. Serves until
``--max-conns`` connections have completed (or the process is
killed). Stdlib only; no Spark, no repo runtime imports beyond the
frame codec.
"""

from __future__ import annotations

import argparse
import os
import socket
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from greenplum_cdc_spark.sources.amqp import (  # noqa: E402
    BASIC_ACK,
    BASIC_CANCEL,
    BASIC_CANCEL_OK,
    BASIC_CONSUME,
    BASIC_CONSUME_OK,
    BASIC_DELIVER,
    CHANNEL_CLOSE,
    CHANNEL_CLOSE_OK,
    CHANNEL_OPEN,
    CHANNEL_OPEN_OK,
    CONNECTION_CLOSE,
    CONNECTION_CLOSE_OK,
    CONNECTION_OPEN,
    CONNECTION_OPEN_OK,
    CONNECTION_START,
    CONNECTION_START_OK,
    CONNECTION_TUNE,
    CONNECTION_TUNE_OK,
    EXCHANGE_DECLARE,
    EXCHANGE_DECLARE_OK,
    FRAME_BODY,
    FRAME_END,
    PROTOCOL_HEADER,
    QUEUE_BIND,
    QUEUE_BIND_OK,
    QUEUE_DECLARE,
    QUEUE_DECLARE_OK,
    pack_content_header,
    pack_frame,
    pack_longstr,
    pack_method_frame,
    pack_shortstr,
    pack_table_empty,
    unpack_method,
)


class Conn:
    """One accepted connection's frame I/O."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.buf = b""

    def read_exact(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("client went away")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def read_frame(self):
        head = self.read_exact(7)
        ftype, channel, size = struct.unpack(">BHI", head)
        payload = self.read_exact(size)
        end = self.read_exact(1)
        assert end == bytes([FRAME_END]), "bad frame end from client"
        return ftype, channel, payload

    def read_method(self):
        while True:
            ftype, channel, payload = self.read_frame()
            if ftype == 1:
                return unpack_method(payload)

    def send(self, data: bytes) -> None:
        self.sock.sendall(data)


def serve_connection(
    conn: Conn,
    messages: list[bytes],
    state: dict,
    drop_after: int | None,
    cancel_after: int | None = None,
    close_channel_after: int | None = None,
) -> None:
    """One client session over the shared queue state
    (``state['acked']`` = messages forgotten, ``state['seen']`` =
    highest message index ever delivered — the redelivered-flag
    watermark). Fault injectors (first connection only, mutually
    exclusive):

    - ``drop_after`` (messages): hard-close (FIN) mid-batch, no ack —
      broker restart; everything redelivers.
    - ``cancel_after`` (messages): send Basic.Cancel to the consumer
      (RabbitMQ consumer-cancel-notification), REQUIRE Basic.CancelOk
      back, keep the channel open so the client's deferred ack STILL
      APPLIES — the remainder (only) arrives on the next subscribe.
    - ``close_channel_after`` (messages): send Channel.Close (406),
      REQUIRE Channel.CloseOk back, and VOID any ack arriving on the
      closed channel — everything delivered redelivers next time."""
    assert conn.read_exact(8) == PROTOCOL_HEADER, "bad protocol header"
    conn.send(
        pack_method_frame(
            0,
            CONNECTION_START,
            bytes([0, 9])
            + pack_table_empty()
            + pack_longstr(b"PLAIN")
            + pack_longstr(b"en_US"),
        )
    )
    got, _ = conn.read_method()
    assert got == CONNECTION_START_OK, got
    conn.send(
        pack_method_frame(
            0, CONNECTION_TUNE, struct.pack(">HIH", 0, 131072, 0)
        )
    )
    got, _ = conn.read_method()
    assert got == CONNECTION_TUNE_OK, got
    got, _ = conn.read_method()
    assert got == CONNECTION_OPEN, got
    conn.send(pack_method_frame(0, CONNECTION_OPEN_OK, pack_shortstr("")))
    got, _ = conn.read_method()
    assert got == CHANNEL_OPEN, got
    conn.send(pack_method_frame(1, CHANNEL_OPEN_OK, struct.pack(">I", 0)))

    # topology declares + consume, in the order the consumer sends them
    ack_base = state["acked"]  # delivery tags are 1-based past this
    delivered = 0
    chan_closed = False  # Channel.Close sent: acks on it are VOID
    await_cancel_ok = False
    while True:
        try:
            got, cur = conn.read_method()
        except ConnectionError:
            return  # client done (or died): unacked stay queued
        if got == EXCHANGE_DECLARE:
            conn.send(pack_method_frame(1, EXCHANGE_DECLARE_OK))
        elif got == QUEUE_DECLARE:
            cur.short()
            qname = cur.shortstr()
            conn.send(
                pack_method_frame(
                    1,
                    QUEUE_DECLARE_OK,
                    pack_shortstr(qname) + struct.pack(">II", 0, 0),
                )
            )
        elif got == QUEUE_BIND:
            conn.send(pack_method_frame(1, QUEUE_BIND_OK))
        elif got == BASIC_CONSUME:
            cur.short()
            cur.shortstr()  # queue
            ctag = cur.shortstr()
            conn.send(
                pack_method_frame(1, BASIC_CONSUME_OK, pack_shortstr(ctag))
            )
            # deliver everything unacked; tags restart at 1 per channel
            for i, body in enumerate(messages[ack_base:]):
                if cancel_after is not None and delivered >= cancel_after:
                    # consumer-cancel-notification: stop delivering,
                    # leave the channel (and the client's pending ack)
                    # fully valid; require CancelOk per nowait=0
                    conn.send(
                        pack_method_frame(
                            1,
                            BASIC_CANCEL,
                            pack_shortstr(ctag) + bytes([0]),
                        )
                    )
                    await_cancel_ok = True
                    break
                if (
                    close_channel_after is not None
                    and delivered >= close_channel_after
                ):
                    # channel-level fault racing the deferred ack:
                    # Close(406) now; the client must CloseOk, and any
                    # ack it had in flight lands on a DEAD channel
                    conn.send(
                        pack_method_frame(
                            1,
                            CHANNEL_CLOSE,
                            struct.pack(">H", 406)
                            + pack_shortstr("PRECONDITION_FAILED - test")
                            + struct.pack(">HH", 0, 0),
                        )
                    )
                    chan_closed = True
                    break
                if drop_after is not None and delivered >= drop_after:
                    # broker "restart": FIN mid-batch, BEFORE the ack —
                    # the in-flight deliveries reach the client (so a
                    # land-before-ack consumer spools the partial
                    # batch), but nothing was acked, so everything
                    # delivered here is REDELIVERED (flag set) on the
                    # next connection. (A hard RST would also discard
                    # the client's receive buffer — that path collapses
                    # to the empty-partial case and hides the dedup.)
                    conn.sock.close()
                    return
                tag = i + 1
                idx = ack_base + i
                # redelivered := already sent on an earlier connection
                # and never acked (the real broker's flag semantics)
                redelivered = 1 if idx < state["seen"] else 0
                state["seen"] = max(state["seen"], idx + 1)
                conn.send(
                    pack_method_frame(
                        1,
                        BASIC_DELIVER,
                        pack_shortstr(ctag)
                        + struct.pack(">Q", tag)
                        + bytes([redelivered])
                        + pack_shortstr("test-exchange")
                        + pack_shortstr("test-key"),
                    )
                )
                conn.send(pack_content_header(60, len(body), 1))
                conn.send(pack_frame(FRAME_BODY, 1, body))
                delivered += 1
        elif got == BASIC_CANCEL_OK:
            assert await_cancel_ok, "unsolicited CancelOk"
            assert cur.shortstr() == ctag, "CancelOk tag mismatch"
            await_cancel_ok = False
            print("CANCEL_OK", flush=True)
        elif got == CHANNEL_CLOSE_OK:
            assert chan_closed, "unsolicited Channel.CloseOk"
            print("CHAN_CLOSE_OK", flush=True)
        elif got == BASIC_ACK:
            tag = cur.longlong()
            multiple = cur.octet()
            assert multiple, "consumer contract is multiple-ack"
            if chan_closed:
                # ack arrived on a closed channel: VOID per AMQP —
                # everything it covered stays queued and redelivers
                print("VOIDED_ACK", flush=True)
            else:
                state["acked"] = ack_base + tag  # tags 1-based past base
        elif got == CONNECTION_CLOSE:
            conn.send(pack_method_frame(0, CONNECTION_CLOSE_OK))
            conn.sock.close()
            return
        else:
            raise AssertionError(f"unexpected method {got}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--messages", required=True, help="one body per line")
    ap.add_argument(
        "--drop-after",
        type=int,
        default=None,
        help="hard-close the FIRST connection after N deliveries",
    )
    ap.add_argument(
        "--cancel-after",
        type=int,
        default=None,
        help="send Basic.Cancel on the FIRST connection after N"
        " deliveries (channel stays open; ack still applies)",
    )
    ap.add_argument(
        "--close-channel-after",
        type=int,
        default=None,
        help="send Channel.Close(406) on the FIRST connection after N"
        " deliveries (acks on the closed channel are voided)",
    )
    ap.add_argument("--max-conns", type=int, default=8)
    args = ap.parse_args()
    with open(args.messages, "rb") as f:
        messages = [ln for ln in f.read().splitlines() if ln]

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", args.port))
    srv.listen(4)
    print(f"READY {srv.getsockname()[1]}", flush=True)

    state = {"acked": 0, "seen": 0}
    first = True
    for _ in range(args.max_conns):
        sock, _addr = srv.accept()
        drop = args.drop_after if first else None
        cancel = args.cancel_after if first else None
        close_ch = args.close_channel_after if first else None
        first = False
        try:
            serve_connection(
                Conn(sock), messages, state, drop, cancel, close_ch
            )
        except (ConnectionError, AssertionError) as e:
            print(f"SESSION_ERROR {e}", flush=True)
        # fully-acked queues keep serving EMPTY sessions until
        # max-conns, so a trailing reconnect sees an empty queue
        # instead of a refused dial
    srv.close()


if __name__ == "__main__":
    main()
