"""RefoMB tabular export (evals/report.py) vs the reference's
json_to_excel.py semantics."""
import csv

from rlaifv_tpu.evals.report import (
    export_refomb_reports,
    refomb_all_data_table,
    refomb_summary_table,
)


def _rows():
    prompt = (
        "[Beginning of the detailed description of the picture]desc here"
        "[End of the detailed description of the picture]\n"
        "[Beginning of the user's question]what color?"
        "[End of the user's question]\n"
        "[Beginning of Model A's answer]blue[End of Model A's answer]\n"
        "[Beginning of Model B's answer]red[End of Model B's answer]"
    )
    return [
        {"modelA": "ours", "modelB": "gpt4v", "type_name": "OCR",
         "score": 1, "prompt": prompt},
        {"modelA": "ours", "modelB": "gpt4v", "type_name": "OCR",
         "score": -1, "prompt": prompt},
        {"modelA": "ours", "modelB": "gpt4v",
         "type_name": "Coarse Perception", "score": 0, "prompt": prompt},
        {"modelA": "ours", "modelB": "gpt4v",
         "type_name": "Coarse Perception", "score": 1, "prompt": ""},
        {"modelA": "ours", "modelB": "gpt4v", "type_name": "OCR",
         "score": None, "prompt": prompt},  # skipped, not counted
    ]


def test_summary_table():
    (rec,) = refomb_summary_table(_rows())
    assert (rec["win"], rec["loss"], rec["tie"]) == (2, 1, 1)
    # ref json_to_excel.py:74 — ties count half
    assert rec["score"] == (2 + 0.5) / 4
    assert rec["OCR"] == "1/1/0"
    assert rec["Coarse Perception"] == "1/0/1"
    assert rec["Relation reasoning"] == "0/0/0"
    assert rec["ALL Check"] == 4
    assert rec["model B"] == "gpt4v"


def test_all_data_table_parses_prompt_sections():
    recs = refomb_all_data_table(_rows())
    assert recs[0]["model A answer"] == "blue"
    assert recs[0]["model B answer"] == "red"
    assert recs[0]["question"] == "what color?"
    assert recs[0]["description"] == "desc here"
    assert "prompt" not in recs[0]
    # markerless prompt degrades to '' instead of raising (ref would throw)
    assert recs[3]["model A answer"] == ""


def test_export_csv_roundtrip(tmp_path):
    paths = export_refomb_reports(_rows(), str(tmp_path / "refomb"))
    with open(paths[0], newline="") as f:
        (row,) = list(csv.DictReader(f))
    assert row["win"] == "2" and row["OCR"] == "1/1/0"
    with open(paths[1], newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 5 and rows[0]["question"] == "what color?"
