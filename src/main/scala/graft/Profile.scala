package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.concurrent.TrieMap

/** Dev tool: run one registered query under the noop sink with a
  * job-level listener, printing every Spark job's wall time and call
  * site so the expensive phase of a multi-job gate is attributable
  * (guide §1.1: find where the time goes before touching anything).
  * Usage: runMain graft.Profile <name> [sfDir] [cpus] [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q60_fact_staff_daily"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val reps = if (args.length > 3) args(3).toInt else 2
    val s = Engine.local(cpus)
    val starts = TrieMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, String)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.headOption.map(_.name.takeWhile(_ != '\n'))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          done.add((j.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for (a <- i.submissionTime; b <- i.completionTime)
          yield (b - a) / 1e3).getOrElse(-1.0)
        stages.add((i.stageId, wall, i.numTasks, i.name.takeWhile(_ != '\n')))
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      done.clear(); stages.clear()
      val t0 = System.nanoTime()
      fn(s, dir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let trailing listener events drain
      import scala.jdk.CollectionConverters._
      val js = done.asScala.toSeq
      println(f"== $name rep $rep: total $total%.3f s, ${js.size} jobs, " +
        f"job-sum ${js.map(_._2).sum}%.3f s ==")
      js.sortBy(-_._2).take(25).foreach { case (id, t, site) =>
        println(f"  job $id%4d  $t%7.3f s  $site")
      }
      println(s"  -- slowest stages --")
      stages.asScala.toSeq.sortBy(-_._2).take(25).foreach {
        case (id, w, n, nm) =>
          println(f"  stage $id%4d  $w%7.3f s  tasks=$n%-4d $nm")
      }
    }
    s.stop()
  }
}
