"""PDB two-chain corpus acquisition (reference data_utils_2protein.py:88-166).

Reference behavior: query RCSB for entries whose assembly has exactly two
protein chains, download each PDB file, and write per-chain sequences as
*concatenated 3-letter residue names* (``residue.get_resname()`` join,
data_utils_2protein.py:131-132) into protein1.fasta / protein2.fasta,
filtering chains longer than 2000 residues.

Re-implemented without BioPython / rcsbsearchapi:
- the RCSB search is one JSON POST to https://search.rcsb.org (the same
  attribute query the reference builds: polymer_entity_instance_count_protein
  == 2);
- PDB parsing reads ATOM records directly — residues are identified by
  (chain id, residue sequence number, insertion code), hetero records
  (HETATM) are skipped exactly like the reference's ``residue.id[0] == ' '``
  filter, and only the first MODEL is used (parser.get_structure iterates
  models; the reference keeps structures whose model has exactly 2 chains).

Network calls are isolated in ``rcsb_two_chain_entry_ids`` /
``download_pdb`` so the parse logic is unit-testable offline.
"""

from __future__ import annotations

import json
import urllib.request
from pathlib import Path

RCSB_SEARCH_URL = "https://search.rcsb.org/rcsbsearch/v2/query"
PDB_DOWNLOAD_URL = "https://files.rcsb.org/download/{pdb_id}.pdb"


def two_chain_query(start: int = 0, rows: int = 10000) -> dict:
    """The reference's AttributeQuery as a raw search payload
    (data_utils_2protein.py:106-109)."""
    return {
        "query": {
            "type": "terminal",
            "service": "text",
            "parameters": {
                "attribute":
                    "rcsb_assembly_info.polymer_entity_instance_count_protein",
                "operator": "equals",
                "value": 2,
            },
        },
        "return_type": "entry",
        "request_options": {"paginate": {"start": start, "rows": rows}},
    }


def rcsb_two_chain_entry_ids(timeout: int = 120) -> list[str]:
    """All PDB entry ids with exactly two protein chain instances."""
    ids: list[str] = []
    start = 0
    while True:
        payload = json.dumps(two_chain_query(start)).encode()
        req = urllib.request.Request(
            RCSB_SEARCH_URL, data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            data = json.loads(r.read())
        batch = [row["identifier"] for row in data.get("result_set", [])]
        ids.extend(batch)
        total = data.get("total_count", len(ids))
        start += len(batch)
        if not batch or start >= total:
            return ids


def download_pdb(pdb_id: str, dest_dir: str | Path, timeout: int = 60
                 ) -> Path | None:
    dest_dir = Path(dest_dir)
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest = dest_dir / f"pdb{pdb_id.lower()}.ent"
    if dest.exists():
        return dest
    try:
        with urllib.request.urlopen(
                PDB_DOWNLOAD_URL.format(pdb_id=pdb_id.upper()),
                timeout=timeout) as r:
            dest.write_bytes(r.read())
        return dest
    except Exception:
        return None


def parse_chain_resnames(pdb_text: str) -> dict[str, str]:
    """{chain_id: concatenated 3-letter resnames}, first model only.

    Mirrors the reference's per-chain ``''.join(residue.get_resname() for
    residue in chain.get_residues() if residue.id[0] == ' ')``: one resname
    per distinct (resseq, icode) among ATOM records, in file order.
    """
    chains: dict[str, list[str]] = {}
    seen: set[tuple[str, str, str]] = set()
    for line in pdb_text.splitlines():
        rec = line[:6]
        if rec == "ENDMDL":
            break  # first model only
        if rec != "ATOM  ":
            continue  # HETATM etc. == residue.id[0] != ' '
        resname = line[17:20].strip()
        chain_id = line[21]
        resseq = line[22:26].strip()
        icode = line[26]
        key = (chain_id, resseq, icode)
        if key in seen:
            continue
        seen.add(key)
        chains.setdefault(chain_id, []).append(resname)
    return {cid: "".join(parts) for cid, parts in chains.items()}


def build_two_chain_fastas(data_dir: str | Path,
                           max_sequence_length: int = 2000,
                           limit: int | None = None,
                           log=print) -> tuple[Path, Path]:
    """Full pipeline: query -> download -> parse -> protein{1,2}.fasta.

    Idempotent: existing FASTAs are kept; existing .ent files are reused.
    """
    data_dir = Path(data_dir)
    f1 = data_dir / "protein1.fasta"
    f2 = data_dir / "protein2.fasta"
    if f1.exists() and f2.exists():
        return f1, f2

    pdb_ids = rcsb_two_chain_entry_ids()
    if limit is not None:
        pdb_ids = pdb_ids[:limit]
    log(f"[pdb] {len(pdb_ids)} two-chain entries")

    recs1: list[tuple[str, str]] = []
    recs2: list[tuple[str, str]] = []
    pdb_files = data_dir / "pdb_files"
    for pdb_id in pdb_ids:
        path = download_pdb(pdb_id, pdb_files)
        if path is None:
            continue
        chains = parse_chain_resnames(path.read_text(errors="replace"))
        if len(chains) != 2:
            continue
        (s1, s2) = list(chains.values())
        if len(s1) <= max_sequence_length and len(s2) <= max_sequence_length:
            recs1.append((f"{pdb_id}_chain_A", s1))
            recs2.append((f"{pdb_id}_chain_B", s2))

    from .fasta import write_fasta
    write_fasta(f1, recs1)
    write_fasta(f2, recs2)
    log(f"[pdb] wrote {len(recs1)} pairs")
    return f1, f2
