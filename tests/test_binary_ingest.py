"""Raw-binary ingest source: JSONL conversation files -> transcript
Dataset -> extraction pipeline."""

import json


def test_read_conversation_files(tmp_path, ray_session):
    from mistralocr_pdf2md_translator_ray.sources.binary_ingest import (
        read_conversation_files,
    )
    from mistralocr_pdf2md_translator_ray.sources.transcripts import TRANSCRIPT_SCHEMA

    d = tmp_path / "convs"
    d.mkdir()
    (d / "chat one.jsonl").write_text(
        "\n".join([
            json.dumps({"turn_idx": 0, "role": "user", "text": "# hi", "tool": "markdown", "ts": 5}),
            json.dumps({"turn_idx": 1, "role": "assistant",
                        "text": "<article><p>A long enough paragraph to survive extraction here.</p></article>",
                        "tool": "html", "ts": 9}),
            "{not valid json",
        ]),
        encoding="utf-8",
    )
    (d / "other.jsonl").write_text(
        json.dumps({"conv_id": "explicit", "turn_idx": 0, "text": "plain", "tool": ""}),
        encoding="utf-8",
    )

    ds = read_conversation_files(str(d))
    df = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(df.columns) == list(TRANSCRIPT_SCHEMA.names)
    assert set(df["conv_id"]) == {"chat_one", "explicit"}  # stem sanitized
    bad = df[df["tool"] == "error"]
    assert len(bad) == 1 and bad.iloc[0]["text"].startswith("{not valid")

    # flows straight into the flagship pipeline
    from mistralocr_pdf2md_translator_ray.pipelines.extract_pipeline import extract_turns

    out = extract_turns(ds).to_pandas()
    assert len(out) == 4
    assert (out["status"] == "ok").all()
