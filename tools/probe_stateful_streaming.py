"""Re-runnable repro for the Python-stateful-streaming hang (PARITY
section 2.9, VERDICT r5 #7). Run: python tools/probe_stateful_streaming.py

Exit 0 + printed sessions = the environment supports
applyInPandasWithState (flip the EXPERIMENTAL flag); exit 2 = the
documented hang reproduces (the AvailableNow drain completes its DATA
microbatch, then the follow-up state-cleanup batch -- status message
"No new data but cleaning up state" -- never terminates).

Last probed: 2026-08-15, pyspark 4.1.2, Python 3.11.7, local[32]:
hang reproduces; no termination after 420 s for a 4-row input.
"""
import os, sys, tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from accelerator_spark.session import get_spark
from accelerator_spark.streaming.structured import sessionize_stateful, stream_from_directory
import pyspark
print("pyspark", pyspark.__version__)
spark = get_spark(app_name="probe_state")
d = tempfile.mkdtemp()
src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
df = spark.createDataFrame(
    [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
     (1, "2024-01-01 02:00:00"), (2, "2024-01-01 01:00:00")],
    "user_id long, ts_s string").selectExpr("user_id", "cast(ts_s as timestamp) as ts")
df.write.mode("overwrite").parquet(src)
stream = stream_from_directory(spark, src, df.schema)
sess = sessionize_stateful(stream, gap_minutes=30)
q = (sess.writeStream.format("memory").queryName("probe_sessions")
     .outputMode("append")
     .option("checkpointLocation", ckpt)
     .trigger(availableNow=True).start())
done = q.awaitTermination(int(os.environ.get('PROBE_WAIT_S', '120')))
print("terminated:", done, "active:", q.isActive)
if not done:
    print("lastProgress:", q.lastProgress)
    print("status:", q.status)
    q.stop()
    sys.exit(2)
rows = spark.sql("select * from probe_sessions order by user_id, session_start").collect()
for r in rows: print(tuple(r))
