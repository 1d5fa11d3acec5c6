package graft.tools

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.AtomicInteger

/** TEMPORARY probe (round 5): the distributed scaling runs show ~8 s of
  * driver-serial time between jobs (betweenJobs) at BOTH 1 and 4 executors —
  * the Amdahl term that now caps N→4N efficiency at ~0.78 after the kernel
  * speedups. This samples the main thread's stack whenever NO job is
  * running and histograms the frames to attribute the serial seconds
  * (Catalyst analysis/optimization vs codegen/Janino vs CC driver finish vs
  * scheduler latency). Usage: runMain graft.tools.GapProfile [nPages] [cores]
  */
object GapProfile {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toInt else 120000
    val cores = if (args.length > 1) args(1) else "4"
    val spark = graft.Bench.makeSession(cores)
    // mimic the cluster protocol's planning mode (AQE on) unless arg(2)=local
    if (!(args.length > 2 && args(2) == "local"))
      spark.conf.set("graft.pipeline.aqeOffDocs", "0")

    val running = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = running.incrementAndGet()
      override def onJobEnd(e: SparkListenerJobEnd): Unit = running.decrementAndGet()
    })

    val mainThread = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    @volatile var sampling = false
    @volatile var gapSamples = 0
    val sampler = new Thread(() => {
      while (!Thread.interrupted()) {
        if (sampling && running.get() == 0) {
          val st = mainThread.getStackTrace
          gapSamples += 1
          // attribute to the deepest "interesting" frame
          val frame = st.find { f =>
            val c = f.getClassName
            c.startsWith("org.apache.spark.sql.catalyst.optimizer") ||
            c.startsWith("org.apache.spark.sql.catalyst.analysis") ||
            c.startsWith("org.codehaus.janino") ||
            c.contains("WholeStageCodegen") ||
            c.contains("CodeGenerator") ||
            c.startsWith("graft.")
          }.map(f => f.getClassName.split("\\.").takeRight(2).mkString(".") + "." + f.getMethodName)
            .getOrElse {
              // fall back to the top app/spark frame
              st.drop(2).headOption.map(f =>
                f.getClassName.split("\\.").takeRight(2).mkString(".") + "." + f.getMethodName)
                .getOrElse("<none>")
            }
          hist.computeIfAbsent(frame, _ => new AtomicInteger(0)).incrementAndGet()
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    // warmup (same as the protocol), then the measured run with sampling on
    graft.Bench.pipelineDocsPerSec(spark, 2000)
    spark.catalog.clearCache()
    sampling = true
    val t0 = System.nanoTime()
    val (dps, _) = graft.Bench.pipelineDocsPerSec(spark, nPages)
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false

    println(f"[gap] pages=$nPages cores=$cores wall=$wall%.1f dps=$dps%.0f " +
      f"gapSamples=$gapSamples (~${gapSamples * 0.01}%.1f s of driver-serial time)")
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2.get()).take(25).foreach { case (f, n) =>
      println(f"[gap] ${n.get() * 0.01}%6.2f s  $f")
    }
    spark.stop()
  }
}
