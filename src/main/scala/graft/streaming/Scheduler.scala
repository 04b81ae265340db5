package graft.streaming

import graft.VectorizeEngine
import graft.types.Schedule

/** Driver-side cron scheduler — the analogue of the reference's
  * pg_cron registration (extension/src/init.rs:37-53: `cron.schedule
  * (job_name, cron, 'select vectorize.job_execute(job)')`). Each
  * poll, every job whose parsed schedule is a [[Schedule.Cron]]
  * matching the current minute gets one `refreshJob` (= job_execute)
  * run; 'realtime' jobs are served by [[Realtime.start]] streams and
  * 'manual' jobs only refresh when the caller asks — both are skipped
  * here, mirroring the reference's mode switch
  * (extension/src/api.rs:90-105).
  *
  * Scale note: the scheduler is a thin driver loop — the refresh it
  * triggers is the fully distributed incremental pipeline (delta scan
  * → embed → MERGE). One scheduler per engine/driver is the intended
  * deployment, like one pg_cron per database.
  */
final class JobScheduler(engine: VectorizeEngine,
    clock: () => java.time.ZonedDateTime = () => java.time.ZonedDateTime.now()) {

  // job name → epoch minute of its last scheduled run (fire at most
  // once per matching minute, like cron)
  private val lastRun = scala.collection.concurrent.TrieMap.empty[String, Long]
  @volatile private var timer: Option[java.util.concurrent.ScheduledExecutorService] = None

  /** Run `refreshJob` for every cron job due at the clock's current
    * minute that has not already fired this minute. Returns the
    * refreshed job names (deterministic order). Exposed for tests and
    * for callers embedding their own loop.
    */
  def runDue(): Seq[String] = {
    val now = clock()
    val epochMinute = now.toEpochSecond / 60
    // R8: poll-based catalog invalidation — pick up jobs another
    // engine created/deleted over the same warehouse (the LISTEN/
    // NOTIFY analogue; the catalog is a tiny parquet read per tick)
    engine.refreshCatalog()
    engine.listJobs.sortBy(_.jobName).flatMap { j =>
      Schedule.parse(j.schedule) match {
        case Right(c: Schedule.Cron)
            if c.matches(now) && !lastRun.get(j.jobName).contains(epochMinute) =>
          lastRun.put(j.jobName, epochMinute)
          // isolate per-job failures: one broken job must not starve
          // the remaining due jobs this poll (pg_cron likewise records
          // a failed run and moves on)
          try { engine.refreshJob(j.jobName); Some(j.jobName) }
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[scheduler] refresh of '${j.jobName}' failed: ${e.getMessage}")
            None
          }
        case _ => None
      }
    }
  }

  /** Start a daemon polling loop. Poll well under a minute so no
    * matching minute is skipped (default 15 s). Idempotent.
    */
  def start(pollSeconds: Long = 15): Unit = synchronized {
    if (timer.isEmpty) {
      val t = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
        val th = new Thread(r, "graft-job-scheduler")
        th.setDaemon(true)
        th
      })
      t.scheduleAtFixedRate(() =>
        try runDue()
        catch { case e: Throwable =>  // keep the loop alive like cron does
          System.err.println(s"[scheduler] refresh failed: ${e.getMessage}")
        },
        0, pollSeconds, java.util.concurrent.TimeUnit.SECONDS)
      timer = Some(t)
    }
  }

  def stop(): Unit = synchronized {
    timer.foreach(_.shutdownNow())
    timer = None
  }
}
