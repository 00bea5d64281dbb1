"""Round-7 decode-tier throughput: imgs/s through image_hashes for every
vendored pixel path (PNG plain/Adam7, GIF, JPEG baseline/progressive) at
64x64, local[32], best-of-2 after warm-up."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

N = 20000
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.range(1000).selectExpr("sum(id)").collect()
docs = spark.range(0, N).withColumnRenamed("id", "doc_id").repartition(64)

def force(df): df.write.format("noop").mode("overwrite").save()

def synth_png(interlaced):
    from nreadspark.ops.images import encode_gray_png, synth_pixel
    import pandas as pd
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType
    def batches(it):
        for pdf in it:
            refs, pay = [], []
            for d in pdf["doc_id"].tolist():
                px = bytes(synth_pixel(int(d) % 97, x, y) for y in range(64) for x in range(64))
                refs.append(f"p://{d}"); pay.append(encode_gray_png(64, 64, px, interlaced=interlaced))
            yield pd.DataFrame({"media_ref": refs, "payload": pay})
    schema = StructType([StructField("media_ref", StringType()), StructField("payload", BinaryType())])
    return docs.select("doc_id").mapInPandas(lambda it: batches(it), schema)

def synth_gif():
    from nreadspark.ops.images import synth_pixel
    from nreadspark.ops.multimodal import encode_gif
    import pandas as pd
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType
    pal = bytes(v for i in range(256) for v in (i, i, i))
    def batches(it):
        for pdf in it:
            refs, pay = [], []
            for d in pdf["doc_id"].tolist():
                px = bytes(synth_pixel(int(d) % 97, x, y) for y in range(64) for x in range(64))
                refs.append(f"g://{d}"); pay.append(encode_gif(64, 64, px, pal))
            yield pd.DataFrame({"media_ref": refs, "payload": pay})
    schema = StructType([StructField("media_ref", StringType()), StructField("payload", BinaryType())])
    return docs.select("doc_id").mapInPandas(lambda it: batches(it), schema)

def synth_jpeg(progressive):
    from nreadspark.ops.images import synth_pixel
    from nreadspark.ops.jpeg import encode_gray_jpeg, encode_gray_jpeg_progressive
    import pandas as pd
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType
    enc = encode_gray_jpeg_progressive if progressive else encode_gray_jpeg
    def batches(it):
        for pdf in it:
            refs, pay = [], []
            for d in pdf["doc_id"].tolist():
                px = bytes(synth_pixel(int(d) % 97, x, y) for y in range(64) for x in range(64))
                refs.append(f"j://{d}"); pay.append(enc(64, 64, px))
            yield pd.DataFrame({"media_ref": refs, "payload": pay})
    schema = StructType([StructField("media_ref", StringType()), StructField("payload", BinaryType())])
    return docs.select("doc_id").mapInPandas(lambda it: batches(it), schema)

from nreadspark.ops.images import image_hashes
for label, mk in [
    ("png-plain", lambda: synth_png(False)),
    ("png-adam7", lambda: synth_png(True)),
    ("gif-lzw", synth_gif),
    ("jpeg-baseline", lambda: synth_jpeg(False)),
    ("jpeg-progressive", lambda: synth_jpeg(True)),
]:
    media = mk().localCheckpoint(eager=True)
    force(image_hashes(media))  # warm
    best = None
    for _ in range(2):
        t0 = time.perf_counter(); force(image_hashes(media)); dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    dec = image_hashes(media).groupBy("decoder").count().collect()
    print(f"RESULT {label:18s} {N/best:8.0f} imgs/s  wall {best:.2f}s  decoders {sorted((r['decoder'], r['count']) for r in dec)}", flush=True)
    media.unpersist()
spark.stop()
