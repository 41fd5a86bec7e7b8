"""PDB parsing pipeline (network-free parts of data/pdb.py)."""

import numpy as np

from protein_clip_tpu.data.pdb import parse_chain_resnames, two_chain_query


def _atom(serial, name, resname, chain, resseq, icode=" "):
    # PDB fixed-column ATOM record
    return (f"ATOM  {serial:>5} {name:<4}{resname:>4} "
            f"{chain}{resseq:>4}{icode}   "
            f"{0.0:8.3f}{0.0:8.3f}{0.0:8.3f}{1.0:6.2f}{0.0:6.2f}"
            f"          {name[0]:>2}")


def test_parse_two_chains_resname_concat():
    lines = [
        _atom(1, "N", "MET", "A", 1),
        _atom(2, "CA", "MET", "A", 1),   # same residue, second atom ignored
        _atom(3, "N", "ALA", "A", 2),
        _atom(4, "N", "GLY", "B", 1),
        _atom(5, "N", "LYS", "B", 2),
        _atom(6, "N", "LYS", "B", 3),
        "HETATM    7  O   HOH A   3      0.000   0.000   0.000  1.00  0.00           O",
        "TER",
        "END",
    ]
    chains = parse_chain_resnames("\n".join(lines))
    assert chains == {"A": "METALA", "B": "GLYLYSLYS"}


def test_parse_first_model_only():
    lines = [
        "MODEL        1",
        _atom(1, "N", "MET", "A", 1),
        "ENDMDL",
        "MODEL        2",
        _atom(2, "N", "GLY", "A", 1),
        "ENDMDL",
    ]
    chains = parse_chain_resnames("\n".join(lines))
    assert chains == {"A": "MET"}


def test_insertion_codes_are_distinct_residues():
    lines = [
        _atom(1, "N", "ALA", "A", 10, " "),
        _atom(2, "N", "GLY", "A", 10, "A"),  # 10A is a distinct residue
    ]
    chains = parse_chain_resnames("\n".join(lines))
    assert chains == {"A": "ALAGLY"}


def test_query_payload_shape():
    q = two_chain_query()
    assert q["query"]["parameters"]["value"] == 2
    assert "polymer_entity_instance_count_protein" in \
        q["query"]["parameters"]["attribute"]
    assert q["return_type"] == "entry"


def test_resname_concat_tokenizes_per_char():
    """The 2protein corpus is 3-letter resname concat; the tokenizer treats
    it as residue characters (reference feeds it to EsmTokenizer as-is)."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    tok = EsmTokenizer()
    ids = tok.encode("METALA")
    assert len(ids) == 8  # cls + 6 chars + eos
