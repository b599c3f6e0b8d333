import org.apache.spark.sql.SparkSession
import graft.core._
import graft.llm._
import graft.run.Enricher

object DeathC { val n = new java.util.concurrent.atomic.AtomicInteger(0) }
class DyingClient2(maxCalls: Int) extends MockLlmClient() {
  override def invoke(prompt: String, sys: Option[String]): LlmResponse = {
    if (DeathC.n.incrementAndGet() > maxCalls) throw new LlmError("crash", retryable = false)
    super.invoke(prompt, sys)
  }
}
object DebugResume {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/tmp/graft_dbg_resume2"
    new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    val df = (0 until 100).map(i => s"text $i").toDF("text").repartition(1)
    val spec = PipelineSpec(
      dataset = DatasetSpec(Seq("text")),
      prompt = PromptSpec("P:{text}"),
      llm = LlmSpec(maxRetries = 0, concurrency = 1),
      processing = ProcessingSpec(errorPolicy = ErrorPolicy.Fail, chunkRows = 20),
      output = OutputSpec(Seq("out")))
    try {
      new Enricher(spec, new DyingClient2(60), Some(dir)).enrich(df)
      println("XX NO CRASH")
    } catch { case e: Throwable => println("XX crashed: " + e.getClass.getName + " " + String.valueOf(e.getMessage).take(150)) }
    println("XX death counter: " + DeathC.n.get)
    val f = new java.io.File(dir + "/responses")
    println("XX ledger exists=" + f.exists)
    if (f.exists) f.listFiles().foreach(x => println("XX   " + x.getName + " " + x.length))
    spark.stop()
  }
}
