package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** GC-vs-skew adjudication for the `eval_map_at_k` 9–17 s bounce
  * (round-11 backlog #7 / SURVEY §6.0b): on identical fresh JVMs the
  * query's min-of-2 wall bounced between two modes with the plan, the
  * broadcast set and the co-partitioning pinned. This harness runs the
  * query N passes in one JVM and, per pass, reads the JVM's OWN GC
  * ledger (GarbageCollectorMXBean cumulative collection time/count)
  * plus the pass wall — so each pass is self-describing:
  *
  *   - wall bounces WITH gc_ms → the tail is GC pause mass (heap/region
  *     sizing is the fix);
  *   - wall bounces with FLAT gc_ms → the tail is compute placement
  *     (JIT/codegen or scheduler skew), not collection.
  *
  * Run it under `-Xlog:gc*` for the pause-length distribution too:
  * `sbt 'set run/javaOptions += "-Xlog:gc:/tmp/gc_mapk.log"'
  *      'runMain graft.ProbeGcMapAtK'`.
  *
  * Usage: `runMain graft.ProbeGcMapAtK [sfDir] [passes]`.
  */
object ProbeGcMapAtK {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(6)
    // arg 3: spark.sql.codegen.hugeMethodLimit — the C2 bistability
    // experiment: HotSpot refuses to compile methods over 8000 bytecodes
    // (DontCompileHugeMethods), so generated whole-stage methods above it
    // run interpreted-or-churning; capping the limit makes Spark fall
    // back to non-fused execution for those stages instead
    val hml = args.lift(2).map(_.toInt).getOrElse(65535)
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.hugeMethodLimit", hml)
      .config("spark.ui.enabled", "false")
    // round-13 churn experiment: the deopt storm concentrates in the
    // two-level hash-agg's fast-map/fallback dual path (PrintCompilation:
    // 78 deopts of one processNext) — these knobs isolate it
    sys.env.get("SPARK_GRAFT_AGG_TWOLEVEL").foreach(v =>
      builder.config("spark.sql.codegen.aggregate.map.twolevel.enabled", v))
    sys.env.get("SPARK_GRAFT_AGG_CAPBIT").foreach(v =>
      builder.config("spark.sql.codegen.aggregate.fastHashMap.capacityBit",
        v))
    sys.env.get("SPARK_GRAFT_AGG_VECTORIZED").foreach(v =>
      builder.config("spark.sql.codegen.aggregate.map.vectorized.enable",
        v))
    val spark = builder.getOrCreate()
    println(s"[gc-mapk] hugeMethodLimit=$hml twolevel=${
      sys.env.getOrElse("SPARK_GRAFT_AGG_TWOLEVEL", "default")} capbit=${
      sys.env.getOrElse("SPARK_GRAFT_AGG_CAPBIT", "default")}")
    spark.sparkContext.setLogLevel("ERROR")
    // the Bench warm-up so pass 1 isn't charged session bring-up
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def gcSnapshot(): (Long, Long) = {
      val beans =
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala
      (beans.map(_.getCollectionTime).sum, beans.map(_.getCollectionCount).sum)
    }
    // /proc/stat aggregate jiffies: (busy = user+nice+sys+irq+softirq,
    // steal) — external-busy per pass = busy delta − this JVM's own CPU
    // delta, the host-steal discriminator the round-11 bench artifacts
    // lacked (a slow pass with big external-busy is contention, not us)
    def hostCpu(): (Long, Long) = {
      val f = scala.io.Source.fromFile("/proc/stat")
      try {
        val c = f.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        (c(0) + c(1) + c(2) + c(5) + c(6), if (c.length > 7) c(7) else 0L)
      } finally f.close()
    }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val jiffyMs = 1000L / sys.process.Process("getconf CLK_TCK").!!.trim.toLong
    // per-stage CPU ledger: names the stage that eats the slow passes
    val stageCpu = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = sc.stageInfo.taskMetrics
          // the RDD scope names carry the physical operator ids
          // (WholeStageCodegen (n), Exchange, ...) — far more useful for
          // naming the hot stage than the callsite the stage name holds
          val rdds = sc.stageInfo.rddInfos.map(_.name).distinct
            .mkString("|").take(120)
          if (m != null) stageCpu.put(sc.stageInfo.stageId,
            (rdds + f"|spill=${m.memoryBytesSpilled / 1e6}%.0fMB",
              m.executorCpuTime / 1000000L, m.executorRunTime))
        }
      })
    val heapBean = java.lang.management.ManagementFactory.getMemoryMXBean
    println(s"[gc-mapk] heap max = " +
      f"${heapBean.getHeapMemoryUsage.getMax / 1e9}%.1f GB, " +
      s"collectors = ${java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getName).mkString(", ")}")

    val rows = (1 to passes).map { i =>
      System.gc() // the Bench discipline: settle debt between passes
      val (gc0, n0) = gcSnapshot()
      val (hb0, st0) = hostCpu()
      val jvm0 = osBean.getProcessCpuTime
      val comp0 = java.lang.management.ManagementFactory
        .getCompilationMXBean.getTotalCompilationTime
      val t0 = System.nanoTime()
      graft.queries.EvalQueries.mapAtKCf(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wallMs = (System.nanoTime() - t0) / 1000000L
      val (gc1, n1) = gcSnapshot()
      val (hb1, st1) = hostCpu()
      val jvmMs = (osBean.getProcessCpuTime - jvm0) / 1000000L
      val extMs = (hb1 - hb0) * jiffyMs - jvmMs
      val used = heapBean.getHeapMemoryUsage.getUsed / 1e9
      println(f"[gc-mapk] pass $i%d: wall=${wallMs / 1000.0}%.1f s  " +
        f"gc=${gc1 - gc0}%d ms (${100.0 * (gc1 - gc0) / wallMs}%.0f%% of " +
        f"wall, ${n1 - n0}%d collections)  heap_used=$used%.1f GB  " +
        f"jvm_cpu=${jvmMs / 1000.0}%.1f s  ext_cpu=${extMs / 1000.0}%.1f s" +
        f"  steal=${(st1 - st0) * jiffyMs}%d ms  jit=${
          java.lang.management.ManagementFactory.getCompilationMXBean
            .getTotalCompilationTime - comp0}%d ms")
      val top = stageCpu.asScala.toSeq.sortBy(-_._2._2).take(4)
      top.foreach { case (id, (name, cpuMs, runMs)) =>
        println(f"[gc-mapk]   stage $id%d cpu=${cpuMs / 1000.0}%.1f s " +
          f"run=${runMs / 1000.0}%.1f s  $name%s") }
      stageCpu.clear()
      (wallMs, gc1 - gc0)
    }
    val walls = rows.map(_._1)
    val gcs = rows.map(_._2)
    println(f"[gc-mapk] wall min/max = ${walls.min / 1000.0}%.1f/" +
      f"${walls.max / 1000.0}%.1f s; gc ms at those passes = " +
      s"${gcs(walls.indexOf(walls.min))}/${gcs(walls.indexOf(walls.max))}")
    spark.stop()
  }
}
