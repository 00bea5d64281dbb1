import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The py4j gateway JVM outlives SparkSession.stop(), so per-module builder
# configs like spark.driver.memory only take effect for whichever test
# module starts the JVM FIRST.  Pin the driver heap for the whole suite
# here (the mega-doc soak needs headroom for its 50 MB documents when it
# runs late in the suite on an already-warm JVM).
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 6g pyspark-shell")

FIXTURES_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
