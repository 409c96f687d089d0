package graft.operators

import graft.SpecBase

class KernelChainSpec extends SpecBase {
  import spark.implicits._

  test("mapReduce word count equals groupBy count") {
    val docs = Seq("a b a", "b c", "a").toDS()
    val got = KernelChain.mapReduce[String, String, Int, (String, Long)](
      docs,
      doc => doc.split(" ").map(w => w -> 1),
      (k, vs) => Iterator.single(k -> vs.map(_.toLong).sum))
      .collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("chained stages: histogram of group sizes") {
    val nums = (1 to 100).toDS()
    // stage 1: count per residue class mod 7
    val stage1 = KernelChain.mapReduce[Int, Int, Int, (Int, Long)](
      nums, n => Seq((n % 7) -> 1),
      (k, vs) => Iterator.single(k -> vs.size.toLong))
    // stage 2: histogram of those counts
    val stage2 = KernelChain.mapReduce[(Int, Long), Long, Int, (Long, Long)](
      stage1, kv => Seq(kv._2 -> 1),
      (k, vs) => Iterator.single(k -> vs.size.toLong))
      .collect().toMap
    // 100 = 7*14 + 2 → two classes of 15, five of 14
    assert(stage2 == Map(15L -> 2L, 14L -> 5L))
  }

  test("perPartition kernel sees each row exactly once") {
    val ds = (1 to 1000).toDS().repartition(7)
    val total = KernelChain.perPartition(ds)(it => Iterator.single(it.sum))
      .collect().sum
    assert(total == 500500)
  }
}
