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
  * The mapping: NameNode/DataNode `CapacityRemaining`/`Remaining` ->
  * local-dir free bytes AND used-capacity fraction; `NumLiveDataNodes`
  * vs the expected node count -> registered executors vs
  * `expectedExecutors`; stale datanodes -> executors that dropped out of
  * the block-manager registry (Spark deregisters on missed heartbeats,
  * so liveness and staleness collapse into one registry check);
  * `NumFailedVolumes` -> a write probe on every local dir;
  * `StartupProgress PercentComplete` -> a real scheduler round-trip.
  *
  * Thresholds are parameters (defaults mirror the reference's fixed
  * constants) so deployments tune them per cluster — and so the spec can
  * drive each check across its threshold and assert the exit contract.
  */
object Health {

  /** Threshold set for one battery run. Defaults are the local-mode
    * analogs of the reference's constants (MIN_DISK_SPACE,
    * NUM_DATA_NODES=1, NUM_NODE_MANAGERS=1). */
  final case class Thresholds(
      minDiskBytes: Long = 1L << 30,
      maxMemoryUsedFraction: Double = 0.9,
      maxDiskUsedFraction: Double = 0.98,
      expectedExecutors: Int = 1)

  final case class Check(name: String, healthy: Boolean, message: String)

  def run(spark: SparkSession, t: Thresholds = Thresholds()): Seq[Check] = {
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

    // executor liveness vs expectation (reference: NumLiveDataNodes /
    // NumActiveNMs vs NUM_DATA_NODES / NUM_NODE_MANAGERS). Spark drops
    // an executor from this registry when heartbeats stop, so this also
    // covers NumStaleDataNodes: stale == no longer registered.
    val execs = sc.getExecutorMemoryStatus
    checks += {
      if (execs.size >= t.expectedExecutors)
        Check("executors", healthy = true,
          s"All expected block managers registered: ${execs.size}/${t.expectedExecutors}.")
      else Check("executors", healthy = false,
        s"Some executors are not connected. Registered: ${execs.size}/${t.expectedExecutors}.")
    }

    // storage memory headroom (reference: CapacityRemaining class)
    val (totalMem, remainingMem) =
      execs.values.foldLeft((0L, 0L)) { case ((tm, r), (max, rem)) => (tm + max, r + rem) }
    checks += {
      val usedFrac =
        if (totalMem == 0) 0.0 else (totalMem - remainingMem).toDouble / totalMem
      if (usedFrac <= t.maxMemoryUsedFraction)
        Check("storage-memory", healthy = true,
          f"Sufficient storage memory. Used: ${usedFrac * 100}%.1f%%.")
      else Check("storage-memory", healthy = false,
        f"Storage memory nearly exhausted: ${usedFrac * 100}%.1f%% used " +
          f"of $totalMem bytes.")
    }

    // local disk space, absolute floor (reference: _check_func_disk_space
    // on Remaining, MIN_DISK_SPACE gate)
    val localDirs = sc.getConf.get("spark.local.dir",
      System.getProperty("java.io.tmpdir")).split(",").map(_.trim).filter(_.nonEmpty)
    val free = localDirs.map(d => new File(d).getUsableSpace).sum
    checks += {
      if (free >= t.minDiskBytes)
        Check("local-disk", healthy = true, s"Sufficient disk space. Remaining: $free bytes.")
      else Check("local-disk", healthy = false,
        s"Insufficient disk space. Minimum required: ${t.minDiskBytes}. Remaining: $free bytes.")
    }

    // disk capacity utilization (reference: CapacityRemaining as a
    // fraction of CapacityTotal — the "cluster is filling up" signal
    // that the absolute floor misses on big volumes)
    checks += {
      val (total, usable) = localDirs.foldLeft((0L, 0L)) { case ((ts, us), d) =>
        val f = new File(d); (ts + f.getTotalSpace, us + f.getUsableSpace)
      }
      val usedFrac = if (total == 0) 1.0 else (total - usable).toDouble / total
      if (usedFrac <= t.maxDiskUsedFraction)
        Check("disk-capacity", healthy = true,
          f"Capacity headroom OK. Used: ${usedFrac * 100}%.1f%%.")
      else Check("disk-capacity", healthy = false,
        f"Local volume nearly full: ${usedFrac * 100}%.1f%% used " +
          f"(threshold ${t.maxDiskUsedFraction * 100}%.1f%%).")
    }

    // volume write probe (reference: NumFailedVolumes — a volume that
    // rejects writes is failed regardless of reported free space)
    checks += {
      val failed = localDirs.filter { d =>
        try {
          val p = File.createTempFile("graft_health_", ".probe", new File(d))
          val ok = p.delete()
          !ok
        } catch { case _: Exception => true }
      }
      if (failed.isEmpty)
        Check("volumes", healthy = true, s"No failed volumes (${localDirs.length} probed).")
      else Check("volumes", healthy = false,
        s"One or more volumes failed a write probe: ${failed.mkString(", ")}.")
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
  def report(spark: SparkSession, t: Thresholds = Thresholds()): Boolean = {
    val sc = spark.sparkContext
    println(s"spark version: ${sc.version}")
    println(s"master: ${sc.master}")
    println(s"default parallelism: ${sc.defaultParallelism}")
    val results = run(spark, t)
    results.foreach { c =>
      val mark = if (c.healthy) "OK  " else "FAIL"
      println(s"[$mark] ${c.name}: ${c.message}")
    }
    val ok = results.forall(_.healthy)
    println(if (ok) "status: OK" else "status: UNHEALTHY")
    ok
  }
}
