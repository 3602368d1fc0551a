"""Raw-binary ingest source: JSONL conversation files -> transcript
Dataset -> extraction pipeline."""

import json


def test_decode_data_url_column(ray_session):
    """Reference-shaped wire format: data-URL strings decode into
    payload:binary + mime + decode_status on the cluster."""
    import base64

    import pyarrow as pa
    import ray.data as rd

    from mistralocr_pdf2md_translator_ray.sources import decode_data_url_column

    blobs = [b"\x89PNG...", b"RIFFxxxx", b"hello world"]
    urls = [
        "data:image/png;base64," + base64.b64encode(blobs[0]).decode(),
        "data:audio/wav;base64," + base64.b64encode(blobs[1]).decode(),
        base64.b64encode(blobs[2]).decode(),  # bare base64, no prefix
    ] + ["data:image/png;base64,%%bad%%"]
    t = pa.table({
        "payload_id": pa.array([f"p{i}" for i in range(4)], pa.string()),
        "data_url": pa.array(urls, pa.string()),
    })
    out = (
        decode_data_url_column(rd.from_arrow(t))
        .to_pandas().sort_values("payload_id").reset_index(drop=True)
    )
    assert "data_url" not in out.columns
    assert [bytes(b) for b in out["payload"][:3]] == blobs
    assert out["mime"].tolist() == ["image/png", "audio/wav", "", "image/png"]
    assert out["decode_status"].tolist() == ["ok", "ok", "ok", "error"]
    assert bytes(out["payload"][3]) == b""  # error-as-value


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
