"""Host-stamp hygiene of the dryrun compile cache (__graft_entry__).

XLA:CPU cache entries embed AOT machine code for the compiling host's CPU;
loading them on a different CPU can SIGILL or wedge a collective rendezvous
(MULTICHIP_r02 post-mortem).  The dryrun stamps the cache with a hash of the
builder CPU's feature flags and purges proactively on mismatch.
"""

import importlib.util
import os
import sys


def _load_entry():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_host_stamp_is_stable_and_hexish():
    mod = _load_entry()
    s1, s2 = mod._host_stamp(), mod._host_stamp()
    assert s1 == s2
    assert len(s1) == 16
    int(s1, 16)  # hex digest prefix


def test_cache_purged_on_stamp_mismatch(tmp_path, monkeypatch):
    mod = _load_entry()
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "stale-entry").write_bytes(b"aot blob from another host")
    (cache / "HOST_STAMP").write_text("0123456789abcdef\n")
    monkeypatch.setattr(mod, "_CACHE", str(cache))

    mod._ensure_cache_matches_host()
    assert not (cache / "stale-entry").exists(), "mismatched cache not purged"
    assert (cache / "HOST_STAMP").read_text().strip() == mod._host_stamp()


def test_cache_kept_on_stamp_match(tmp_path, monkeypatch):
    mod = _load_entry()
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "warm-entry").write_bytes(b"entry compiled on this host")
    (cache / "HOST_STAMP").write_text(mod._host_stamp() + "\n")
    monkeypatch.setattr(mod, "_CACHE", str(cache))

    mod._ensure_cache_matches_host()
    assert (cache / "warm-entry").exists(), "matching cache wrongly purged"


def test_unstamped_cache_purged(tmp_path, monkeypatch):
    # pre-stamp caches (or caches from an interrupted purge) are untrusted
    mod = _load_entry()
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "unknown-entry").write_bytes(b"no stamp")
    monkeypatch.setattr(mod, "_CACHE", str(cache))

    mod._ensure_cache_matches_host()
    assert not (cache / "unknown-entry").exists()
    assert (cache / "HOST_STAMP").exists()
