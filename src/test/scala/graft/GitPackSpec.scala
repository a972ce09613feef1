package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GitPack

/** Git packfile walk: the committed `git pack-objects` fixture
  * (real delta chain included) walks to the exact ids and sizes
  * git itself assigns; the in-repo writer round-trips and its
  * packs pass `git index-pack --strict` (GitPackPinGen records
  * the run); hash lies and damage refuse; the walk is total.
  */
class GitPackSpec extends AnyFunSuite {

  private def fixture: Array[Byte] = {
    val in = getClass.getResourceAsStream("/gitpack/ref.pack")
    assert(in != null)
    try in.readAllBytes() finally in.close()
  }

  test("the git-written pack walks to git's own ids, types and " +
      "content sizes, delta chain resolved") {
    val os = GitPack.packObjects(fixture).get
    val got = os.map(o => (o.id, o.objType, o.size, o.deltaDepth))
      .toSet
    // ids/types/sizes recorded from git cat-file; the depth-1 row
    // is the OFS_DELTA member git chose during packing
    assert(got == Set(
      ("67169249b1e8b195f9d3852022f126202dec8528", "commit", 129L,
        0),
      ("e2ef5de9cfe9bcb1e8319f84e32934f015e751a7", "tree", 99L, 0),
      ("9f5149753d8d56995b626e140a6b7b5fc858416a", "blob", 960L, 0),
      ("2691af8c52ed99de84e6f77cd897c197f4b73168", "blob", 957L, 1),
      ("1a1f8944d78693be21a532139920a014cf43c974", "blob", 32L, 0)))
    // reconstructed delta content is the real file
    val d = os.find(_.deltaDepth == 1).get
    assert(new String(d.data, "UTF-8")
      .endsWith("tail A unique content here\n"))
  }

  test("writer round-trips; ids equal git's blob hashing rule") {
    val blobs = Seq(
      "first blob content with enough shared prefix material",
      "first blob content with enough shared prefix DIVERGED",
      "tiny").map(_.getBytes("UTF-8"))
    for (deltas <- Seq(false, true)) {
      val os = GitPack.packObjects(
        GitPack.packWrite(blobs, deltas)).get
      assert(os.length == 3, deltas.toString)
      for ((o, b) <- os.zip(blobs)) {
        assert(o.data.sameElements(b), deltas.toString)
        // git's id: sha1("blob <len>\0" + content)
        val md = java.security.MessageDigest.getInstance("SHA-1")
        md.update(s"blob ${b.length} ".getBytes
          .updated(s"blob ${b.length}".length, 0.toByte))
        md.update(b)
        assert(o.id == md.digest()
          .map(x => f"${x & 0xff}%02x").mkString, deltas.toString)
      }
      assert(os(1).deltaDepth == (if (deltas) 1 else 0))
    }
  }

  test("refusals: trailing-hash lie, version, torn stream, slack") {
    val good = GitPack.packWrite(Seq("data".getBytes), false)
    assert(GitPack.packObjects(good).isDefined)
    assert(GitPack.packObjects(null).isEmpty)
    val lie = good.clone()
    lie(lie.length - 1) = (lie(lie.length - 1) ^ 1).toByte
    assert(GitPack.packObjects(lie).isEmpty, "trailing sha lie")
    val v3 = good.clone()
    v3(7) = 3
    assert(GitPack.packObjects(v3).isEmpty, "version")
    assert(GitPack.packObjects(good.take(good.length - 5)).isEmpty)
    assert(GitPack.packObjects(
      good ++ Array[Byte](0, 0)).isEmpty, "slack")
  }

  test("walk is total under mutation") {
    val base = GitPack.packWrite(Seq(
      ("mutate " * 50).getBytes, ("mutate " * 50 + "x").getBytes),
      useDeltas = true)
    val rnd = new scala.util.Random(0x617)
    for (_ <- 0 until 400) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      GitPack.packObjects(m) // must never throw
    }
  }
}
