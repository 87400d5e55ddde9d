package graft

import java.nio.file.{Files, Paths}

import graft.model.Tier

/**
 * STANDING-SERVICE soak: [[Service]] run as a deployment would run it —
 * continuous frame arrivals, a live command client, periodic
 * maintenance cycles, and operator pause/resume — for `seconds` of
 * wall clock, with the end state audited:
 *
 *  1. EXACTLY-ONCE ACROSS EVERYTHING: every frame fed lands in gen_raw
 *     exactly once, across ctrl stop/start cycles (each resume replays
 *     the stream from its checkpoint) and concurrent maintenance;
 *  2. every command issued gets its response file;
 *  3. maintenance cycles fire on their own and the rollup tier
 *     materializes from live data;
 *  4. `_stop` shuts the whole assembly down cleanly.
 *
 * Usage: runMain graft.ServiceSoak [workDir] [seconds]
 * Prints one `service_soak` JSON line for BENCH_SF1.md.
 */
object ServiceSoak {

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("tmp-svcsoak")
    val seconds = args.lift(1).map(_.toInt).getOrElse(120)
    val spark = GraftSession.builder(shufflePartitions = 32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(work), true)

    val conf = Service.Config(
      storeRoot = s"$work/store", framesDir = s"$work/frames",
      checkpointDir = s"$work/ck", commandDir = s"$work/cmds",
      saveIntervalMs = 200L, maintenanceIntervalMs = 5000L,
      commandPollMs = 100L, selectors = Seq("pt:j1/mt:evt/#"))
    val svc = new Service(spark, conf).start()

    def tai64n(sec: Long): String =
      f"@${sec + 4611686018427387904L}%016x00000000"
    @volatile var feeding = true
    var fed = 0
    val feeder = new Thread(() => {
      while (feeding) {
        val v = fed + 1
        val line = tai64n(System.currentTimeMillis() / 1000 - 60) +
          s" pt:j1/mt:evt/rt:dev/rn:z/ad:${v % 7}/sv:sensor_temp/ad:${v % 7} " +
          s"""{"serv":"sensor_temp","type":"evt.sensor.report","val_t":"float","val":$v.0,"props":{"unit":"C"},"src":"app"}"""
        val tmp = Paths.get(conf.framesDir, s"._f$v.log")
        Files.write(tmp, line.getBytes("UTF-8"))
        Files.move(tmp, Paths.get(conf.framesDir, s"f$v.log"))
        fed += 1
        Thread.sleep(200)
      }
    }, "soak-feeder")
    feeder.start()

    var issued = 0
    def issue(json: String): Unit = {
      issued += 1
      val tmp = Paths.get(conf.commandDir, f"._cmd-$issued%05d.json")
      Files.write(tmp, json.getBytes("UTF-8"))
      Files.move(tmp, Paths.get(conf.commandDir, f"cmd-$issued%05d.json"))
    }

    val t0 = System.currentTimeMillis()
    var pauses = 0
    var nextPause = t0 + 15000L
    while (System.currentTimeMillis() - t0 < seconds * 1000L) {
      issue("""{"type":"cmd.tsdb.get_data_points","uid":"soak",
        |"val":{"measurementName":"sensor_temp.evt.sensor.report","relativeTime":"1h"}}""".stripMargin)
      if (System.currentTimeMillis() >= nextPause) {
        // operator pause/resume mid-stream: the resume must replay
        // nothing twice and lose nothing queued during the pause
        issue("""{"type":"cmd.ecprocess.ctrl","uid":"soak","val":{"procId":1,"op":"stop"}}""")
        Thread.sleep(2000)
        issue("""{"type":"cmd.ecprocess.ctrl","uid":"soak","val":{"procId":1,"op":"start"}}""")
        pauses += 1
        nextPause += 15000L
      }
      Thread.sleep(2000)
    }
    feeding = false
    feeder.join()
    val fedFinal = fed

    // drain: every fed frame must land exactly once
    def rawCount(): Long = svc.store.read(Tier.GenRaw).count()
    val drainDeadline = System.currentTimeMillis() + 120000L
    while (rawCount() < fedFinal && System.currentTimeMillis() < drainDeadline)
      Thread.sleep(500)
    val rows = rawCount()
    require(rows == fedFinal,
      s"exactly-once violated: fed $fedFinal frames, store holds $rows rows")
    val distinctVals = svc.store.read(Tier.GenRaw)
      .select("value").distinct().count()
    require(distinctVals == fedFinal,
      s"duplicate/lost values: $distinctVals distinct of $fedFinal")

    // every command answered
    def count(prefix: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(conf.commandDir))
        .count(_.getPath.getName.startsWith(prefix))
    val rspDeadline = System.currentTimeMillis() + 60000L
    while (count("rsp-") < issued && System.currentTimeMillis() < rspDeadline)
      Thread.sleep(200)
    val answered = count("rsp-")
    require(answered == issued, s"commands answered $answered of $issued")

    val cycles = svc.cyclesDone
    require(cycles >= 2, s"maintenance cycles: $cycles")
    val dayRows = svc.store.read(Tier.GenDay).count()
    require(dayRows > 0, "rollup tier never materialized")

    // clean shutdown via the transport
    Files.write(Paths.get(conf.commandDir, "_stop"), Array.empty[Byte])
    val stopDeadline = System.currentTimeMillis() + 30000L
    while (svc.isRunning && System.currentTimeMillis() < stopDeadline)
      Thread.sleep(100)
    require(!svc.isRunning, "service did not stop on _stop")

    println(s"""{"service_soak":{"seconds":$seconds,"frames":$fedFinal,""" +
      s""""rows":$rows,"pauses":$pauses,"commands":$issued,""" +
      s""""answered":$answered,"maintenance_cycles":$cycles,""" +
      s""""gen_day_rows":$dayRows,"exactly_once":true,"clean_stop":true}}""")
    spark.stop()
  }
}
