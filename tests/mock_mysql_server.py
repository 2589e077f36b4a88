"""In-repo mock MySQL server for capture-daemon tests.

Speaks just enough of the public client/server protocol to exercise
scripts/capture_daemon.py end to end over a real localhost socket:
handshake-v10 greeting, HandshakeResponse41 parsing, scramble verification
for mysql_native_password and caching_sha2_password (fast path), the
AuthSwitchRequest flow, COM_QUERY (answered OK, SQL recorded), and
COM_BINLOG_DUMP (answers with a configured list of event payloads, then
EOF).  Single connection per server instance; runs on a daemon thread."""

from __future__ import annotations

import hashlib
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


# ---------------------------------------------------------------------------
# fixed test RSA keypair (1024-bit, generated offline with Miller-Rabin,
# seed 20260817) for the caching_sha2 plaintext full-auth exchange.  Test
# fixture only — never a production key.
# ---------------------------------------------------------------------------

RSA_N = int(
    "5c29f8ce3cc773d4600eb7645db1125e2916b87ed6a42e93807451e4ca080a94"
    "e7503c054449751b381025c911d267c603b7865909ca356005a78981a8f14eef"
    "9cd68c8eb509fd295bd6fd27b42c4cad9194400673ac2641a9aca5ae3439ba37"
    "96173c41f9c9f9c07c22fb0eb9ec9fcae3dd18cf9a4cc283c5c723ac471900f7", 16
)
RSA_E = 65537
RSA_D = int(
    "41aa4df173709060928829b642e2f4b94e01383676ebc79ba47c3c150cb52a04"
    "e9c24ae15dc410c1f1f1df5a216e8e2d915c63467129375a50ed0b95ec2ef213"
    "ffd1deda135c78a85285e6b89edd0dc6a72c91376fa046c16efbe95919f4fa6d"
    "d663fc11be78ff4f69ba13d29cda86b1f0619a28bad0c495b665d5fe2e4c73c1", 16
)


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    b = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(b)]) + b


def _der_int(v: int) -> bytes:
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return b"\x02" + _der_len(len(b)) + b


def rsa_public_pem(n: int = RSA_N, e: int = RSA_E) -> bytes:
    """PEM SubjectPublicKeyInfo exactly as mysqld serves it."""
    import base64

    rsa_key = _der_int(n) + _der_int(e)
    rsa_seq = b"\x30" + _der_len(len(rsa_key)) + rsa_key
    bits = b"\x03" + _der_len(len(rsa_seq) + 1) + b"\x00" + rsa_seq
    # AlgorithmIdentifier: OID 1.2.840.113549.1.1.1 + NULL
    alg = bytes.fromhex("300d06092a864886f70d0101010500")
    spki_body = alg + bits
    spki = b"\x30" + _der_len(len(spki_body)) + spki_body
    b64 = base64.encodebytes(spki).replace(b"\n", b"")
    lines = [b64[i : i + 64] for i in range(0, len(b64), 64)]
    return (
        b"-----BEGIN PUBLIC KEY-----\n"
        + b"\n".join(lines)
        + b"\n-----END PUBLIC KEY-----\n"
    )


def rsa_oaep_decrypt(cipher: bytes, n: int = RSA_N, d: int = RSA_D) -> bytes:
    """Server-side RSAES-OAEP-DECRYPT (SHA-1, empty label)."""
    from capture_daemon import _mgf1

    k = (n.bit_length() + 7) // 8
    em = pow(int.from_bytes(cipher, "big"), d, n).to_bytes(k, "big")
    assert em[0] == 0, "bad OAEP leading byte"
    masked_seed, masked_db = em[1:21], em[21:]
    seed = bytes(a ^ b for a, b in zip(masked_seed, _mgf1(masked_db, 20)))
    db = bytes(a ^ b for a, b in zip(masked_db, _mgf1(seed, k - 21)))
    assert db[:20] == hashlib.sha1(b"").digest(), "bad OAEP label hash"
    sep = db.index(1, 20)
    return db[sep + 1 :]


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
        self.key_requested: bool | None = None  # full_rsa: did 0x02 arrive?
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
        elif plugin == "caching_sha2_password" and self.auth_mode == "full_rsa":
            # cache miss over a PLAINTEXT socket: the client must request
            # the server public key (0x02) and send the XOR-scrambled
            # password under RSA-OAEP — exactly mysqld's exchange
            from capture_daemon import xor_password_scramble

            assert auth == self._expected(plugin, self.nonce), "bad sha2 scramble"
            assert not self.tls_established, "full_rsa mode tests the plaintext leg"
            send_packet(conn, b"\x01\x04", seq + 1)  # full-auth needed
            try:
                seq, req = read_packet(conn)
            except ConnectionError:
                return
            if req == b"\x02":
                # unpinned client: serve the key over the wire
                self.key_requested = True
                send_packet(conn, b"\x01" + rsa_public_pem(), seq + 1)
                seq, cipher = read_packet(conn)
            else:
                # pinned client (--server-public-key-path analogue): the
                # first packet after full-auth-needed is already the
                # ciphertext — mysqld accepts this without a key request
                self.key_requested = False
                cipher = req
            scrambled = rsa_oaep_decrypt(bytes(cipher))
            assert scrambled == xor_password_scramble(self.password, self.nonce), (
                "bad RSA-OAEP password scramble"
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
