"""In-repo mock MySQL server for capture-daemon tests.

Speaks just enough of the public client/server protocol to exercise
scripts/capture_daemon.py end to end over a real localhost socket:
handshake-v10 greeting, HandshakeResponse41 parsing, scramble verification
for mysql_native_password and caching_sha2_password (fast path), the
AuthSwitchRequest flow, COM_QUERY (answered OK, SQL recorded), and
COM_BINLOG_DUMP (answers with a configured list of event payloads, then
EOF).  Single connection per server instance; runs on a daemon thread."""

from __future__ import annotations

import os
import socket
import struct
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from capture_daemon import (  # noqa: E402
    CLIENT_LONG_PASSWORD,
    CLIENT_PLUGIN_AUTH,
    CLIENT_PROTOCOL_41,
    CLIENT_SECURE_CONNECTION,
    CLIENT_SSL,
    scramble_caching_sha2,
    scramble_native,
)


def make_self_signed_cert(tmpdir: str) -> tuple[str, str, bytes]:
    """Self-signed localhost cert for the TLS upgrade tests: returns
    (cert_path, key_path, cert_pem).  The SAN carries IP 127.0.0.1 so the
    client can do REAL hostname verification against it."""
    import datetime
    import ipaddress

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "mock-mysql")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName(
                [x509.IPAddress(ipaddress.ip_address("127.0.0.1"))]
            ),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    cert_pem = cert.public_bytes(serialization.Encoding.PEM)
    cert_path = os.path.join(tmpdir, "mock-mysql.crt")
    key_path = os.path.join(tmpdir, "mock-mysql.key")
    with open(cert_path, "wb") as f:
        f.write(cert_pem)
    with open(key_path, "wb") as f:
        f.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.TraditionalOpenSSL,
                serialization.NoEncryption(),
            )
        )
    return cert_path, key_path, cert_pem

_CAPS = (
    CLIENT_LONG_PASSWORD
    | CLIENT_PROTOCOL_41
    | CLIENT_SECURE_CONNECTION
    | CLIENT_PLUGIN_AUTH
)

OK_PACKET = b"\x00\x00\x00\x02\x00\x00\x00"


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client closed")
        buf += chunk
    return bytes(buf)


def read_packet(conn: socket.socket) -> tuple[int, bytes]:
    hdr = _recv_exact(conn, 4)
    ln = hdr[0] | (hdr[1] << 8) | (hdr[2] << 16)
    return hdr[3], _recv_exact(conn, ln)


def send_packet(conn: socket.socket, payload: bytes, seq: int) -> None:
    conn.sendall(len(payload).to_bytes(3, "little") + bytes([seq & 0xFF]) + payload)


class MockMySQLServer:
    def __init__(
        self,
        password: str = "secret",
        user: str = "repl",
        plugin: str = "mysql_native_password",
        auth_mode: str = "plain",  # "plain" | "switch"
        event_payloads: list[bytes] | None = None,
        nonce: bytes | None = None,
        ssl_ctx=None,  # server-side SSLContext: accept the TLS upgrade
    ):
        self.password = password.encode()
        self.user = user
        self.plugin = plugin
        self.auth_mode = auth_mode
        self.ssl_ctx = ssl_ctx
        self.tls_established = False
        self.event_payloads = event_payloads or []
        # nonce must have no trailing NULs (servers use printable bytes)
        self.nonce = nonce or bytes(range(1, 21))
        self.queries: list[str] = []
        self.dump_args: dict | None = None
        self.error: BaseException | None = None
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._run, daemon=True)

    # -- lifecycle -----------------------------------------------------------

    def __enter__(self) -> "MockMySQLServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._srv.close()
        self._thread.join(timeout=10)
        if self.error is not None:
            raise AssertionError(f"mock server failed: {self.error!r}")

    def _run(self) -> None:
        try:
            conn, _ = self._srv.accept()
            with conn:
                self._session(conn)
        except BaseException as e:  # surfaced by __exit__
            self.error = e

    # -- protocol ------------------------------------------------------------

    def _greeting(self) -> bytes:
        part1, part2 = self.nonce[:8], self.nonce[8:20]
        return (
            bytes([10])
            + b"8.0.99-mock\x00"
            + (99).to_bytes(4, "little")
            + part1
            + b"\x00"
            + (_CAPS & 0xFFFF).to_bytes(2, "little")
            + bytes([0x21])
            + (2).to_bytes(2, "little")
            + (_CAPS >> 16).to_bytes(2, "little")
            + bytes([21])  # auth data len (20 + NUL)
            + b"\x00" * 10
            + part2
            + b"\x00"
            + self.plugin.encode()
            + b"\x00"
        )

    def _expected(self, plugin: str, nonce: bytes) -> bytes:
        fn = scramble_native if plugin == "mysql_native_password" else scramble_caching_sha2
        return fn(self.password, nonce)

    def _session(self, conn: socket.socket) -> None:
        send_packet(conn, self._greeting(), 0)
        seq, resp = read_packet(conn)
        caps, _maxp, _cs = struct.unpack_from("<IIB", resp)
        if caps & CLIENT_SSL:
            # SSLRequest (32-byte prelude, no username): upgrade NOW; the
            # real HandshakeResponse41 arrives over the encrypted channel
            assert len(resp) == 32, f"SSLRequest must be 32 bytes, got {len(resp)}"
            assert self.ssl_ctx is not None, "client asked for TLS, server has no ctx"
            conn = self.ssl_ctx.wrap_socket(conn, server_side=True)
            self.tls_established = True
            seq, resp = read_packet(conn)
            caps, _maxp, _cs = struct.unpack_from("<IIB", resp)
        assert caps & CLIENT_PROTOCOL_41, "client must set CLIENT_PROTOCOL_41"
        pos = 4 + 4 + 1 + 23
        end = resp.index(0, pos)
        user = resp[pos:end].decode()
        assert user == self.user, f"unknown user {user!r}"
        pos = end + 1
        alen = resp[pos]
        pos += 1
        auth = resp[pos:pos + alen]
        pos += alen
        plugin = resp[pos:resp.index(0, pos)].decode()

        if self.auth_mode == "switch":
            # ask the client to redo auth with mysql_native_password
            nonce2 = bytes(range(40, 60))
            send_packet(
                conn,
                b"\xfe" + b"mysql_native_password\x00" + nonce2 + b"\x00",
                seq + 1,
            )
            seq, auth = read_packet(conn)
            assert auth == self._expected("mysql_native_password", nonce2), (
                "bad switched scramble"
            )
            send_packet(conn, OK_PACKET, seq + 1)
        elif plugin == "caching_sha2_password" and self.auth_mode == "full":
            # cache miss: full auth.  Over TLS the protocol is the literal
            # cleartext password + NUL (what a real server accepts when the
            # channel is already encrypted)
            assert auth == self._expected(plugin, self.nonce), "bad sha2 scramble"
            assert self.tls_established, "full-auth test requires the TLS upgrade"
            send_packet(conn, b"\x01\x04", seq + 1)  # full-auth needed
            try:
                seq, cleartext = read_packet(conn)
            except ConnectionError:
                return  # client refused full auth (e.g. non-TLS) and hung up
            assert cleartext == self.password + b"\x00", "bad cleartext password"
            send_packet(conn, OK_PACKET, seq + 1)
        elif plugin == "caching_sha2_password":
            assert auth == self._expected(plugin, self.nonce), "bad sha2 scramble"
            send_packet(conn, b"\x01\x03", seq + 1)  # fast-auth success
            send_packet(conn, OK_PACKET, seq + 2)
        else:
            assert auth == self._expected(plugin, self.nonce), "bad native scramble"
            send_packet(conn, OK_PACKET, seq + 1)

        # command loop
        while True:
            try:
                _seq, cmd = read_packet(conn)
            except ConnectionError:
                return
            if not cmd:
                return
            if cmd[0] == 0x03:  # COM_QUERY
                self.queries.append(cmd[1:].decode())
                send_packet(conn, OK_PACKET, 1)
            elif cmd[0] == 0x12:  # COM_BINLOG_DUMP
                pos_, flags, sid = struct.unpack_from("<IHI", cmd, 1)
                self.dump_args = {
                    "pos": pos_,
                    "flags": flags,
                    "server_id": sid,
                    "file": cmd[11:].decode(),
                }
                s = 1
                for p in self.event_payloads:
                    send_packet(conn, p, s)
                    s += 1
                send_packet(conn, b"\xfe\x00\x00\x00\x00", s)  # EOF
                return
            elif cmd[0] == 0x1E:  # COM_BINLOG_DUMP_GTID
                flags, sid = struct.unpack_from("<HI", cmd, 1)
                fn_len = struct.unpack_from("<I", cmd, 7)[0]
                base = 11 + fn_len
                pos_ = struct.unpack_from("<Q", cmd, base)[0]
                data_len = struct.unpack_from("<I", cmd, base + 8)[0]
                self.dump_args = {
                    "pos": pos_,
                    "flags": flags,
                    "server_id": sid,
                    "file": cmd[11:base].decode(),
                    "gtid_payload": bytes(cmd[base + 12 : base + 12 + data_len]),
                }
                s = 1
                for p in self.event_payloads:
                    send_packet(conn, p, s)
                    s += 1
                send_packet(conn, b"\xfe\x00\x00\x00\x00", s)
                return
            elif cmd[0] == 0x01:  # COM_QUIT
                return
            else:
                raise AssertionError(f"unexpected command {cmd[0]:#x}")
