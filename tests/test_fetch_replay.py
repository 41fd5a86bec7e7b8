"""Replay-fixture tests for the network layer (VERDICT r2 #9).

The HTTP orchestration in data/fetch.py and data/pdb.py had only its
parsers covered; these tests drive the full download paths offline by
injecting recorded responses through a patched ``urllib.request.urlopen``:

- Propedia: two FASTA fragments in the real Propedia record shape
  (reference data_utils.py:87-110 reads non-header lines only);
- RCSB: a paginated search.rcsb.org v2 JSON pair + three PDB entry files
  exercising the exactly-2-chains and max-length filters
  (reference data_utils_2protein.py:88-166).

Covers: request routing, search pagination, per-entry download, filter
rules, FASTA output, idempotence (cache hits skip the network), and the
offline error message.
"""

import io
import json
import urllib.request
from pathlib import Path

import pytest

from protein_clip_tpu.data import fetch, pdb
from protein_clip_tpu.data.fasta import parse_fasta

FIXTURES = Path(__file__).parent / "fixtures"


class _Response(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class _Replay:
    """urlopen stand-in serving recorded bodies; counts hits per URL."""

    def __init__(self, routes):
        self.routes = routes
        self.calls: list[str] = []

    def __call__(self, req, timeout=None):
        url = req if isinstance(req, str) else req.full_url
        self.calls.append(url)
        for key, body in self.routes.items():
            if key in url:
                if callable(body):
                    body = body(req)
                return _Response(body)
        raise AssertionError(f"unexpected URL in replay: {url}")


def test_download_propedia_replay(tmp_path, monkeypatch):
    replay = _Replay({
        "peptide.fasta": (FIXTURES / "propedia_peptide.fasta").read_bytes(),
        "receptor.fasta": (FIXTURES / "propedia_receptor.fasta").read_bytes(),
    })
    monkeypatch.setattr(urllib.request, "urlopen", replay)

    fetch.download_propedia(tmp_path)
    assert len(replay.calls) == 2
    peps = parse_fasta(tmp_path / "peptide.fasta")
    recs = parse_fasta(tmp_path / "receptor.fasta")
    assert [rid for rid, _ in peps] == ["1a1m_C_A", "1awr_C_B", "2x4s_P_H"]
    assert peps[0][1] == "GILGFVFTL"
    assert len(peps) == len(recs)  # the reference asserts this too

    # idempotent: second call must not touch the network
    fetch.download_propedia(tmp_path)
    assert len(replay.calls) == 2


def test_download_propedia_offline_error(tmp_path, monkeypatch):
    def deny(req, timeout=None):
        raise OSError("no route to host")

    monkeypatch.setattr(urllib.request, "urlopen", deny)
    with pytest.raises(RuntimeError, match="synthetic-fixture"):
        fetch.download_propedia(tmp_path)


def _rcsb_routes():
    page1 = (FIXTURES / "rcsb_search_page1.json").read_bytes()
    page2 = (FIXTURES / "rcsb_search_page2.json").read_bytes()

    def search(req):
        start = json.loads(req.data)["request_options"]["paginate"]["start"]
        return page1 if start == 0 else page2

    return {
        "search.rcsb.org": search,
        "download/1AAA.pdb": (FIXTURES / "pdb1aaa.ent").read_bytes(),
        "download/2BBB.pdb": (FIXTURES / "pdb2bbb.ent").read_bytes(),
        "download/3CCC.pdb": (FIXTURES / "pdb3ccc.ent").read_bytes(),
    }


def test_build_two_chain_fastas_replay(tmp_path, monkeypatch):
    replay = _Replay(_rcsb_routes())
    monkeypatch.setattr(urllib.request, "urlopen", replay)

    f1, f2 = pdb.build_two_chain_fastas(tmp_path, max_sequence_length=15,
                                        log=lambda *a: None)
    # pagination: two search POSTs, then one download per entry id
    assert sum("search.rcsb.org" in u for u in replay.calls) == 2
    assert sum("files.rcsb.org" in u for u in replay.calls) == 3

    recs1 = parse_fasta(f1)
    recs2 = parse_fasta(f2)
    # 1AAA kept (2 chains, resname-string lens 12/9 <= 15 — the filter
    # counts concatenated 3-letter-code chars, as the reference does);
    # 2BBB dropped (3 chains);
    # 3CCC dropped (chain A resname string length 24 > 15)
    assert [rid for rid, _ in recs1] == ["1AAA_chain_A"]
    assert recs1[0][1] == "METLYSTHRVAL"
    assert recs2[0][1] == "GLYALASER"

    # downloaded entries are cached as .ent files
    assert (tmp_path / "pdb_files" / "pdb1aaa.ent").exists()

    # idempotence level 1: FASTAs exist -> nothing happens at all
    n = len(replay.calls)
    pdb.build_two_chain_fastas(tmp_path, max_sequence_length=15)
    assert len(replay.calls) == n

    # idempotence level 2: FASTAs removed but .ent cache present -> the
    # search re-runs, the per-entry downloads do not
    f1.unlink()
    f2.unlink()
    pdb.build_two_chain_fastas(tmp_path, max_sequence_length=15,
                               log=lambda *a: None)
    assert sum("files.rcsb.org" in u for u in replay.calls) == 3
    assert parse_fasta(f1) == recs1


def test_download_pdb_two_chain_wrapper(tmp_path, monkeypatch):
    """fetch.download_pdb_two_chain delegates and wraps failures with the
    offline hint (fetch.py:55-61)."""
    replay = _Replay(_rcsb_routes())
    monkeypatch.setattr(urllib.request, "urlopen", replay)
    fetch.download_pdb_two_chain(tmp_path, max_sequence_length=15)
    assert (tmp_path / "protein1.fasta").exists()

    def deny(req, timeout=None):
        raise OSError("no egress")

    monkeypatch.setattr(urllib.request, "urlopen", deny)
    with pytest.raises(RuntimeError, match="synthetic-fixture"):
        fetch.download_pdb_two_chain(tmp_path / "fresh")
