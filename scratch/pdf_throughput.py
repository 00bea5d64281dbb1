"""PDF-tier throughput: synthesize N PDFs once (untimed), then time extract_pdf."""
import sys, time
from pyspark.sql import SparkSession, functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .config("spark.driver.extraJavaOptions", "-Xms8g -XX:+AlwaysPreTouch")
         .config("spark.ui.enabled", "false").getOrCreate())
import pyarrow as pa
from nreadspark.pdf import extract_pdf, make_pdf

base = spark.range(N).select(F.col("id").cast("string").alias("doc_id"),
                             F.concat(F.lit("Synthetic paragraph one, with commas, for doc "),
                                      F.col("id").cast("string")).alias("text"))
def synth(it):
    for batch in it:
        ids = batch.column(0).to_pylist(); texts = batch.column(1).to_pylist()
        pdfs = [make_pdf(f"Doc {i}", [[("text", t), ("image", "Im1")], [("text", t + " page two")]])
                for i, t in zip(ids, texts)]
        yield pa.RecordBatch.from_arrays([pa.array(ids, pa.string()), pa.array(pdfs, pa.binary())],
                                         names=["doc_id", "pdf"])
path = f"/tmp/nreadspark_pdf_corpus_{N}"
import os
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    base.repartition(64).mapInArrow(synth, "doc_id string, pdf binary").write.mode("overwrite").parquet(path)
pdfs = spark.read.parquet(path)
def run():
    extract_pdf(pdfs).write.format("noop").mode("overwrite").save()
run(); run()  # warm
best = None
for _ in range(3):
    t0 = time.perf_counter(); run(); dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print(f"{N} PDFs extracted in {best:.2f}s = {N/best:.0f} docs/s at local[32]")
spark.stop()
