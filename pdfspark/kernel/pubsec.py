"""Public-key (certificate-based) security handler support —
ISO 32000-1 §7.6.5 (/Filter /Adobe.PubSec, /SubFilter adbe.pkcs7.s5).

The recipient identity is a TEST FIXTURE generated lazily on first
use and cached per host under ~/.cache/pdfspark with LINK-IF-ABSENT
semantics (deliberately NOT the C-extension cache's last-writer-wins
rename: racing workers must converge on whichever identity landed
FIRST, or payloads enveloped by one worker would not open for
another), so no private key ever lives in the repository.  Every
Spark worker on a host shares the cached identity, which is all the
single-host test/driver topology needs; a real multi-host deployment
injects its own certificates via
``PubSecSecurityHandler.authenticate_identity``.
"""

from __future__ import annotations

import os
import tempfile
import time

_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "pdfspark", "pubsec_fixture.pem"
)
_loaded = None


def _generate_pem() -> bytes:
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "pdfspark-test-recipient")]
    )
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(0x5AFE)
        .not_valid_before(datetime.datetime(2020, 1, 1))
        .not_valid_after(datetime.datetime(2120, 1, 1))
        .sign(key, hashes.SHA256())
    )
    return key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    ) + cert.public_bytes(serialization.Encoding.PEM)


def fixture_identity():
    """(certificate, private_key) for the per-host fixture recipient;
    generated once, cached atomically, shared by every worker."""
    global _loaded
    if _loaded is not None:
        return _loaded
    from cryptography import x509
    from cryptography.hazmat.primitives import serialization

    pem = None
    if os.path.exists(_CACHE):
        with open(_CACHE, "rb") as f:
            pem = f.read()
    if pem is None:
        pem = _generate_pem()
        os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(_CACHE))
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(pem)
            try:
                # link-if-absent: unlike rename, link() FAILS when the
                # target exists, so racing workers converge on
                # whichever identity landed first, never overwriting
                os.link(tmp, _CACHE)
            except FileExistsError:
                pass
            except OSError:
                # filesystem without hard links (FUSE/overlay/VFAT):
                # election via O_CREAT|O_EXCL on a SENTINEL, publication
                # via rename — the winner is unique AND the cache file
                # only ever appears fully written (writing through the
                # O_EXCL fd itself would let readers see a torn PEM)
                lock = _CACHE + ".lock"
                try:
                    os.close(os.open(
                        lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o600
                    ))
                except FileExistsError:
                    # loser: wait for the winner's atomic rename; if the
                    # winner died between lock and publish, time out and
                    # publish ours (rename is atomic either way)
                    for _ in range(100):
                        if os.path.exists(_CACHE):
                            break
                        time.sleep(0.05)
                    else:
                        os.replace(tmp, _CACHE)
                        tmp = None
                else:
                    os.replace(tmp, _CACHE)
                    tmp = None
        finally:
            if tmp is not None and os.path.exists(tmp):
                os.unlink(tmp)
        with open(_CACHE, "rb") as f:
            pem = f.read()  # the link winner is the truth
    cert = x509.load_pem_x509_certificate(pem)
    key = serialization.load_pem_private_key(pem, password=None)
    _loaded = (cert, key)
    return _loaded
