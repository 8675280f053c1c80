package graft

/** The per-query persist registry: [[Caches.scoped]] must release
  * exactly the handles its body registered — the guarantee the
  * streaming maintenance epochs lean on (one persisted vector-table
  * copy per epoch must not accumulate for a stream's lifetime). */
class CachesSpec extends SparkSpec {

  import spark.implicits._

  test("scoped releases handles registered inside the body, keeps prior ones") {
    Caches.releaseAll()
    val outer = Caches.persist(Seq(1, 2, 3).toDF("a"))
    outer.count()
    val inner = Caches.scoped {
      val df = Caches.persist(Seq(4, 5).toDF("b"))
      df.count()
      assert(df.storageLevel.useMemory, "persisted inside the scope")
      df
    }
    assert(!inner.storageLevel.useMemory,
      "scope exit must unpersist handles registered inside it")
    assert(outer.storageLevel.useMemory,
      "handles registered before the scope must survive it")
    Caches.releaseAll()
    assert(!outer.storageLevel.useMemory)
  }

  test("scoped releases on exception too") {
    val holder = new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.DataFrame]()
    intercept[RuntimeException](Caches.scoped {
      val df = Caches.persist(Seq(1).toDF("a"))
      df.count()
      holder.set(df)
      throw new RuntimeException("boom")
    })
    assert(!holder.get().storageLevel.useMemory,
      "an exception must not leak the scope's handles")
  }
}
