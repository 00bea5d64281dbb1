"""Round-8 media-tier throughput: imgs/s through the hash kernels for
the NEW tiers (pHash added to every decode path, MP4 keyframes, PDF
embedded images, ID3 cover art) at 64x64 payloads, local[32],
best-of-2 after warm-up -- the apples-to-apples delta vs the r7 soak
quantifies what the DCT pHash costs on the pixel path."""
import sys, time
sys.path.insert(0, "/root/repo")
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

N = 20000
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()
docs = spark.range(0, N).withColumnRenamed("id", "doc_id").repartition(64)

def force(df): df.write.format("noop").mode("overwrite").save()

SCHEMA = StructType([StructField("media_ref", StringType()), StructField("payload", BinaryType())])

def synth(make):
    def batches(it):
        for pdf in it:
            refs, pay = [], []
            for d in pdf["doc_id"].tolist():
                refs.append(f"m://{d}")
                pay.append(make(int(d)))
            yield pd.DataFrame({"media_ref": refs, "payload": pay})
    return docs.select("doc_id").mapInPandas(batches, SCHEMA)

def jpeg_payload(d):
    from nreadspark.ops.images import synth_pixel
    from nreadspark.ops.jpeg import encode_blocky_jpeg
    vals = [synth_pixel(d % 97, bx, by) for by in range(8) for bx in range(8)]
    return encode_blocky_jpeg(8, 8, vals)

def mp4_payload(d):
    j = jpeg_payload(d)
    def box(t, b): return (8 + len(b)).to_bytes(4, "big") + t + b
    mvhd = bytes(12) + (1000).to_bytes(4, "big") + (4000).to_bytes(4, "big") + bytes(80)
    return (box(b"ftyp", b"isom" + bytes(4) + b"isomiso2")
            + box(b"moov", box(b"mvhd", mvhd)) + box(b"mdat", j))

def id3_payload(d):
    j = jpeg_payload(d)
    def ss(n): return bytes([(n>>21)&0x7F,(n>>14)&0x7F,(n>>7)&0x7F,n&0x7F])
    apic = bytes([0]) + b"image/jpeg\x00" + bytes([3]) + b"c\x00" + j
    frame = b"APIC" + len(apic).to_bytes(4, "big") + b"\x00\x00" + apic
    return b"ID3" + bytes([3, 0, 0]) + ss(len(frame)) + frame

def pdf_payload(d):
    from nreadspark.pdf import make_pdf
    return make_pdf(f"D{d}", [[("text", "x"), ("image", "Fig1")]],
                    images={"Fig1": jpeg_payload(d)})

def run(label, df_fn):
    runs = []
    for _ in range(3):
        t0 = time.perf_counter(); force(df_fn()); runs.append(time.perf_counter() - t0)
    best = min(runs[1:])  # drop warm-up
    print(f"{label:28s} {N/best:8.0f} payloads/s  (best {best:.2f}s of {[round(r,2) for r in runs]})")

from nreadspark.ops.images import image_hashes, video_keyframe_hashes
from nreadspark.ops.audio import audio_cover_hashes

jpeg_df = synth(jpeg_payload)
run("image_hashes jpeg 64x64", lambda: image_hashes(synth(jpeg_payload)))
run("video_keyframe_hashes", lambda: video_keyframe_hashes(synth(mp4_payload)))
run("audio_cover_hashes", lambda: audio_cover_hashes(synth(id3_payload)))

def pdf_df():
    import pyarrow as pa
    from nreadspark.ops.images import pdf_image_hashes
    def synthp(it):
        for batch in it:
            ids = batch.column(0).to_pylist()
            yield pa.RecordBatch.from_arrays(
                [pa.array([str(i) for i in ids], pa.string()),
                 pa.array([pdf_payload(int(i)) for i in ids], pa.binary())],
                names=["doc_id", "pdf"])
    return pdf_image_hashes(docs.selectExpr("cast(doc_id as string) doc_id")
                            .mapInArrow(synthp, "doc_id string, pdf binary"))
run("pdf_image_hashes", pdf_df)
spark.stop()
