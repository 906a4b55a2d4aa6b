package graft.cli

import java.io.File

import org.apache.spark.sql.SparkSession

/** Health battery — the Spark-native analog of the reference's per-node
  * JMX checks (reference: playground.py:330-431: startup progress, HA
  * state, missing blocks, capacity remaining, live/stale datanodes,
  * failed volumes, active/unhealthy node managers). Each check returns
  * (name, healthy, message) against an explicit threshold, and the verb
  * exits non-zero when any check fails — same contract as playground.py's
  * aggregated NodeHealthReport.
  *
  * The mapping: NameNode/DataNode capacity -> local-dir disk space;
  * live datanodes -> registered executors; startup progress -> a real
  * scheduler round-trip; missing blocks -> block-manager memory status.
  */
object Health {

  /** Minimum free disk under spark.local.dir / tmp, mirroring the
    * reference's MIN_DISK_SPACE gate. */
  val minDiskBytes: Long = 1L << 30

  /** Max tolerated fraction of storage memory already in use. */
  val maxMemoryUsedFraction: Double = 0.9

  final case class Check(name: String, healthy: Boolean, message: String)

  def run(spark: SparkSession): Seq[Check] = {
    val sc = spark.sparkContext
    val checks = scala.collection.mutable.ArrayBuffer[Check]()

    // scheduler round-trip (reference: StartupProgress PercentComplete)
    checks += (try {
      val n = sc.parallelize(1 to 64, 4).count()
      if (n == 64L) Check("scheduler", healthy = true, "Job round-trip completed.")
      else Check("scheduler", healthy = false, s"Probe job returned $n/64 rows.")
    } catch {
      case e: Exception =>
        Check("scheduler", healthy = false, s"Probe job failed: ${e.getMessage}")
    })

    // executor liveness (reference: NumLiveDataNodes / NumActiveNMs)
    val execs = sc.getExecutorMemoryStatus
    checks += {
      if (execs.nonEmpty)
        Check("executors", healthy = true, s"${execs.size} block manager(s) registered.")
      else Check("executors", healthy = false, "No block managers registered.")
    }

    // storage memory headroom (reference: CapacityRemaining class)
    val (totalMem, remainingMem) =
      execs.values.foldLeft((0L, 0L)) { case ((t, r), (max, rem)) => (t + max, r + rem) }
    checks += {
      val usedFrac =
        if (totalMem == 0) 0.0 else (totalMem - remainingMem).toDouble / totalMem
      if (usedFrac <= maxMemoryUsedFraction)
        Check("storage-memory", healthy = true,
          f"Sufficient storage memory. Used: ${usedFrac * 100}%.1f%%.")
      else Check("storage-memory", healthy = false,
        f"Storage memory nearly exhausted: ${usedFrac * 100}%.1f%% used " +
          f"of $totalMem bytes.")
    }

    // local disk space (reference: _check_func_disk_space on Remaining)
    val localDir = new File(
      sc.getConf.get("spark.local.dir", System.getProperty("java.io.tmpdir")))
    val free = localDir.getUsableSpace
    checks += {
      if (free >= minDiskBytes)
        Check("local-disk", healthy = true, s"Sufficient disk space. Remaining: $free bytes.")
      else Check("local-disk", healthy = false,
        s"Insufficient disk space. Minimum required: $minDiskBytes. Remaining: $free bytes.")
    }

    // SQL surface (reference: response-only check on dependent services)
    checks += (try {
      val one = spark.sql("SELECT 1 AS ok").collect().head.getInt(0)
      if (one == 1) Check("sql", healthy = true, "SQL round-trip completed.")
      else Check("sql", healthy = false, s"SELECT 1 returned $one.")
    } catch {
      case e: Exception => Check("sql", healthy = false, s"SQL failed: ${e.getMessage}")
    })

    checks.toSeq
  }

  /** Print the battery and return the overall verdict. */
  def report(spark: SparkSession): Boolean = {
    val sc = spark.sparkContext
    println(s"spark version: ${sc.version}")
    println(s"master: ${sc.master}")
    println(s"default parallelism: ${sc.defaultParallelism}")
    val results = run(spark)
    results.foreach { c =>
      val mark = if (c.healthy) "OK  " else "FAIL"
      println(s"[$mark] ${c.name}: ${c.message}")
    }
    val ok = results.forall(_.healthy)
    println(if (ok) "status: OK" else "status: UNHEALTHY")
    ok
  }
}
