"""Shared SFTP transport for the S11 source and W9 sink (reference
``spark.json:15`` dataSource sftp / ``spark.json:85-86`` dataTarget sftp).

paramiko-gated: the container has no paramiko, so everything imports it
lazily and the tests drive these paths with a fake transport module.

Scale note: sftp is a single-stream protocol — an ingestion/delivery edge
for vendor drops, never the 100 TB path; staging through the driver's
temp dir matches that reality.
"""

from __future__ import annotations

import os
import stat as _stat


def _load_private_key(paramiko, key_path: str):
    """Key-type-agnostic private-key loading: Ed25519 → ECDSA → RSA (the
    old RSA-only loading rejected modern default keys)."""
    last: Exception | None = None
    for attr in ("Ed25519Key", "ECDSAKey", "RSAKey"):
        cls = getattr(paramiko, attr, None)
        if cls is None:
            continue
        try:
            return cls.from_private_key_file(key_path)
        except Exception as e:  # wrong type / passphrase — try the next
            last = e
    raise ValueError(f"could not load private key {key_path!r}: {last}")


def _expected_host_key(paramiko, host: str, host_key_path: str | None):
    """Resolve the server's expected public key from ``hostKeyPath`` or,
    when present, the default ``~/.ssh/known_hosts``. Returns None when no
    key source exists (connection proceeds unverified, as before)."""
    hostkeys_cls = getattr(paramiko, "HostKeys", None)
    if hostkeys_cls is None:  # fake/partial module
        return None
    candidates = [host_key_path] if host_key_path else [
        os.path.expanduser("~/.ssh/known_hosts")
    ]
    for path in candidates:
        if not path or not os.path.exists(path):
            continue
        entry = hostkeys_cls(path).lookup(host)
        if entry:
            for ktype in entry.keys():
                return entry[ktype]
        if host_key_path:
            raise ValueError(f"host {host!r} not found in hostKeyPath {path!r}")
    if host_key_path:
        raise ValueError(f"hostKeyPath {host_key_path!r} does not exist")
    return None


def connect(host: str, options: dict[str, str]):
    """Open (transport, sftp_client). Options: port, username, password,
    keyPath (Ed25519/ECDSA/RSA), hostKeyPath (known_hosts format — when
    given, the server key MUST match; otherwise ~/.ssh/known_hosts is
    consulted if present, else the connection is unverified)."""
    import paramiko

    transport = paramiko.Transport((host, int(options.get("port", 22))))
    try:
        connect_kwargs: dict = {"username": options.get("username")}
        if options.get("keyPath"):
            connect_kwargs["pkey"] = _load_private_key(paramiko, options["keyPath"])
        else:
            connect_kwargs["password"] = options.get("password")
        expected = _expected_host_key(paramiko, host, options.get("hostKeyPath"))
        if expected is not None:
            connect_kwargs["hostkey"] = expected  # paramiko verifies on connect
        transport.connect(**connect_kwargs)
        sftp = paramiko.SFTPClient.from_transport(transport)
        return transport, sftp
    except BaseException:
        transport.close()
        raise


def download(sftp, remote_path: str, local_dir: str) -> str:
    """Fetch a remote file or directory (one level) into ``local_dir``;
    returns the staged local path. Separated from transport setup so tests
    can exercise it with a fake client."""
    base = os.path.basename(remote_path.rstrip("/")) or "sftp_input"
    dest = os.path.join(local_dir, base)
    attrs = sftp.stat(remote_path)
    if _stat.S_ISDIR(attrs.st_mode):
        os.makedirs(dest, exist_ok=True)
        for entry in sftp.listdir(remote_path):
            rp = remote_path.rstrip("/") + "/" + entry
            if _stat.S_ISREG(sftp.stat(rp).st_mode):
                sftp.get(rp, os.path.join(dest, entry))
    else:
        sftp.get(remote_path, dest)
    return dest


def _mkdirs(sftp, remote_dir: str) -> None:
    """mkdir -p on the remote (sftp has no recursive mkdir)."""
    parts = remote_dir.rstrip("/").split("/")
    cur = ""
    for p in parts:
        cur = (cur + "/" + p) if p else cur
        if not cur:
            continue
        try:
            sftp.stat(cur)
        except IOError:
            sftp.mkdir(cur)


def upload(sftp, local_path: str, remote_dir: str) -> list[str]:
    """Push a staged local file or directory (one level) to ``remote_dir``;
    returns the remote paths written. Mirror of :func:`download` so the W9
    sink shares the reader's gating and test harness."""
    _mkdirs(sftp, remote_dir)
    written: list[str] = []
    if os.path.isdir(local_path):
        for entry in sorted(os.listdir(local_path)):
            lp = os.path.join(local_path, entry)
            # skip Hadoop bookkeeping (_SUCCESS, .*.crc) — a vendor drop
            # wants the data files only
            if os.path.isfile(lp) and not entry.startswith((".", "_")):
                rp = remote_dir.rstrip("/") + "/" + entry
                sftp.put(lp, rp)
                written.append(rp)
    else:
        rp = remote_dir.rstrip("/") + "/" + os.path.basename(local_path)
        sftp.put(local_path, rp)
        written.append(rp)
    return written
