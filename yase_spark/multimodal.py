"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata (LLM-pipeline brief).

The Spark-side plumbing is REAL — schemas, partitioning, Arrow batch
shapes, and the mapInPandas kernel signatures are exactly what a
production decode path uses; only the codec itself is stubbed, because
this sandbox ships no image/audio libraries. Two payload formats exist:

* ``raw-f32`` — a deterministic fake codec (little-endian float32
  planes) that the kernels fully implement, so every operator is
  end-to-end testable with real bytes;
* anything else (``png``, ``jpeg``, ``wav``, ...) — raises
  ``NotImplementedError("codec not available in sandbox: ...")`` at the
  decode step, clearly marking where PIL/libsndfile/ffmpeg plug in.

At 100 TB the payload column dominates storage: the kernels never
shuffle it (decode/feature passes are map-only over the source
partitioning), and feature outputs are the only thing that moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "item_id long, modality string, format string, payload binary, "
    "width int, height int, channels int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = (
    "item_id long, modality string, n_values long, mean double, std double, l2 double"
)


def synthesize_media(emb: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the ``embeddings``
    fixture (no external data): each vector's float32 bytes become an
    opaque payload, typed by label — label 0 -> 8x8x1 'image', label 1 ->
    64-sample 'audio', else a 4-frame 4x4x1 'video'. The PLUMBING
    (binary column + typed metadata) is the point; bytes are real."""
    import numpy as np
    import pandas as pd

    def pack(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for r in pdf.itertuples():
                lbl = int(r.label)
                payload = np.asarray(r.embedding, dtype="<f4").tobytes()
                modality = "image" if lbl == 0 else ("audio" if lbl == 1 else "video")
                wh = 8 if lbl == 0 else (0 if lbl == 1 else 4)
                rows.append(
                    (
                        int(r.vec_id), modality, "raw-f32", payload,
                        wh, wh, 1,
                        16000 if lbl == 1 else 0,
                        1 if lbl in (0, 1) else 4,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "item_id", "modality", "format", "payload",
                    "width", "height", "channels", "sample_rate", "n_frames",
                ],
            )

    return emb.select("vec_id", "embedding", "label").mapInPandas(
        pack, schema=MEDIA_SCHEMA
    )


def _decode_one(fmt: str, payload: bytes):
    """Decode a payload to a float32 numpy array or raise the
    clearly-marked stub error for real codecs."""
    import numpy as np

    if fmt == "raw-f32":
        return np.frombuffer(payload, dtype="<f4")
    raise NotImplementedError(
        f"codec not available in sandbox: {fmt!r} — plug PIL/libsndfile/"
        "ffmpeg into multimodal._decode_one on a full deployment"
    )


def media_features(media: DataFrame) -> DataFrame:
    """Decode + per-item feature extraction (mean/std/l2) as ONE
    Arrow-batched mapInPandas pass over (item_id, modality, format,
    payload). Map-only: the payload column never shuffles."""
    import numpy as np
    import pandas as pd

    def feats(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for r in pdf.itertuples():
                v = _decode_one(r.format, bytes(r.payload)).astype(np.float64)
                n = int(v.size)
                rows.append(
                    (
                        int(r.item_id), r.modality, n,
                        float(v.mean()) if n else 0.0,
                        float(v.std()) if n else 0.0,
                        float(np.sqrt((v * v).sum())),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["item_id", "modality", "n_values", "mean", "std", "l2"],
            )

    return media.select("item_id", "modality", "format", "payload").mapInPandas(
        feats, schema=FEATURE_SCHEMA
    )


def media_values(media: DataFrame) -> DataFrame:
    """Explode decoded payload values -> (item_id, idx, val double).
    The oracle/debug surface of the decode path (every payload float
    becomes one checkable row); map-only like every media kernel."""
    import numpy as np
    import pandas as pd

    def vals(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, vs = [], [], []
            for r in pdf.itertuples():
                v = _decode_one(r.format, bytes(r.payload)).astype(np.float64)
                ids.append(np.full(v.size, int(r.item_id), dtype=np.int64))
                idxs.append(np.arange(v.size, dtype=np.int32))
                vs.append(v)
            if ids:
                yield pd.DataFrame(
                    {
                        "item_id": np.concatenate(ids),
                        "idx": np.concatenate(idxs),
                        "val": np.concatenate(vs),
                    }
                )

    return media.select("item_id", "format", "payload").mapInPandas(
        vals, schema="item_id long, idx int, val double"
    )


def image_resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Average-pool 'images' (width x height float planes) to
    (out_w x out_h); non-image rows pass through untouched. Output
    schema == input schema (payload replaced, width/height updated)."""
    import numpy as np
    import pandas as pd

    def resize(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = pdf.copy()
            for i, r in enumerate(pdf.itertuples()):
                if r.modality != "image":
                    continue
                img = _decode_one(r.format, bytes(r.payload)).astype(
                    np.float64
                ).reshape(int(r.height), int(r.width))
                bh, bw = img.shape[0] // out_h, img.shape[1] // out_w
                # pool in float64 with a FIXED summation order (row sums
                # first, then across rows) so the result is reproducible
                # bit-for-bit against an oracle using the same order;
                # output storage stays float32 like the input
                pooled = (
                    img[: bh * out_h, : bw * out_w]
                    .reshape(out_h, bh, out_w, bw)
                    .sum(axis=3).sum(axis=1) / float(bh * bw)
                ).astype("<f4")
                out.iat[i, out.columns.get_loc("payload")] = pooled.tobytes()
                out.iat[i, out.columns.get_loc("width")] = out_w
                out.iat[i, out.columns.get_loc("height")] = out_h
            yield out

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Keep every ``every_n``-th frame of 'video' payloads (frames are
    contiguous width*height*channels planes); other rows pass through."""
    import pandas as pd

    def sample(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = pdf.copy()
            for i, r in enumerate(pdf.itertuples()):
                if r.modality != "video" or int(r.n_frames) <= 1:
                    continue
                v = _decode_one(r.format, bytes(r.payload))
                frames = v.reshape(int(r.n_frames), -1)
                kept = frames[::every_n]
                out.iat[i, out.columns.get_loc("payload")] = (
                    kept.astype("<f4").tobytes()
                )
                out.iat[i, out.columns.get_loc("n_frames")] = kept.shape[0]
            yield out

    return media.mapInPandas(sample, schema=MEDIA_SCHEMA)
