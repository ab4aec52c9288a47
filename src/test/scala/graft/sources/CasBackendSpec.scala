package graft.sources

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The CAS seam: the SAME generation-protocol race must serialize on
  * the link-based local backend and on the in-memory conditional-PUT
  * double — PointerCas knows only the put-if-absent primitive. */
class CasBackendSpec extends AnyFunSuite {

  private def raceIncrements(b: CasBackend): Unit = {
    val dir = Files.createTempDirectory("graft_cas").toFile
    val threads = 6
    val perThread = 25
    // bootstrap
    assert(PointerCas.commitIfGen(dir, 0L, "0", b))
    val pool = (1 to threads).map { _ =>
      new Thread(() => {
        var done = 0
        while (done < perThread) {
          val g = PointerCas.gen(dir, b)
          val cur = PointerCas.read(dir, b).get.trim.toLong
          if (PointerCas.commitIfGen(dir, g, (cur + 1).toString, b))
            done += 1
        }
      })
    }
    pool.foreach(_.start())
    pool.foreach(_.join(120000))
    // every increment serialized: none lost, none doubled
    assert(PointerCas.read(dir, b).get.trim.toLong ==
      threads.toLong * perThread)
    assert(PointerCas.gen(dir, b) == threads.toLong * perThread + 1)
  }

  test("racing CAS increments serialize on the local (hard-link) backend") {
    raceIncrements(LocalCas)
  }

  test("racing CAS increments serialize on the in-memory backend") {
    raceIncrements(new InMemoryCas)
  }

  test("putIfAbsent is exclusive per name; read-after-win sees full " +
    "content; delete frees the name") {
    Seq(LocalCas: CasBackend, new InMemoryCas).foreach { b =>
      val dir = Files.createTempDirectory("graft_cas_p").toFile
      val f = new File(dir, "_ptr.1")
      val winners = new java.util.concurrent.atomic.AtomicInteger(0)
      val ts = (1 to 8).map { i =>
        new Thread(() => {
          if (b.putIfAbsent(f, s"w$i".getBytes("UTF-8")))
            winners.incrementAndGet()
          ()
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join(60000))
      assert(winners.get() == 1, s"$b: exactly one writer must win")
      val content = new String(b.read(f), "UTF-8")
      assert(content.matches("w[1-8]"))
      assert(b.list(dir).contains("_ptr.1"))
      b.delete(f)
      assert(!b.list(dir).contains("_ptr.1"))
      assert(b.putIfAbsent(f, "again".getBytes("UTF-8")),
        "a deleted name must be takeable again")
    }
  }

  test("a writer paused across the retention window cannot land a " +
    "phantom commit on a pruned slot: the win is withdrawn as a lost race") {
    Seq(LocalCas: CasBackend, new InMemoryCas).foreach { b =>
      val dir = Files.createTempDirectory("graft_cas_ph").toFile
      assert(PointerCas.commitIfGen(dir, 0L, "v1", b))
      // the hazard: pre-check passes at gen 1, then the writer stalls
      // while the world advances PAST the retention window — its slot
      // (_ptr.2) gets pruned and freed. The put-if-absent would "win"
      // a name no reader will ever resolve; commitIfGen must detect
      // the stale win and report false, head content untouched.
      val stalled = PointerCas.commitIfGen(dir, 1L, "PHANTOM", b,
        beforePut = () => {
          var g = PointerCas.gen(dir, b)
          while (g < 1L + PointerCas.Keep + 2L) {
            assert(PointerCas.commitIfGen(dir, g, s"v${g + 1}", b))
            g += 1
          }
        })
      assert(!stalled, s"$b: a phantom win must report a lost race")
      val head = PointerCas.gen(dir, b)
      assert(PointerCas.read(dir, b).get == s"v$head",
        "the head must be the live lineage, not the phantom")
      // the withdrawn slot must not linger below the head
      assert(!b.list(dir).contains("_ptr.2"))
    }
  }

  // ---- the WIRE backend: the same matrix over real HTTP round-trips
  // (HttpCas against an in-process object-store stub whose
  // If-None-Match precondition is evaluated atomically server-side —
  // the S3/GCS conditional-PUT path as code, not a comment) ----

  private def withWire[A](body: CasBackend => A): A = {
    val srv = new CasStubServer
    try body(new HttpCas(srv.endpoint)) finally srv.stop()
  }

  test("racing CAS increments serialize on the HTTP wire backend") {
    withWire(raceIncrements)
  }

  test("putIfAbsent is exclusive per name over the wire; read/list/" +
    "delete round-trip; a 412 is the lost race") {
    withWire { b =>
      val dir = Files.createTempDirectory("graft_cas_w").toFile
      val f = new File(dir, "_ptr.1")
      val winners = new java.util.concurrent.atomic.AtomicInteger(0)
      val ts = (1 to 8).map { i =>
        new Thread(() => {
          if (b.putIfAbsent(f, s"w$i".getBytes("UTF-8")))
            winners.incrementAndGet()
          ()
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join(60000))
      assert(winners.get() == 1, "exactly one wire writer must win")
      assert(new String(b.read(f), "UTF-8").matches("w[1-8]"))
      assert(b.list(dir).contains("_ptr.1"))
      assert(!b.putIfAbsent(f, "loser".getBytes("UTF-8")))
      b.delete(f)
      assert(!b.list(dir).contains("_ptr.1"))
      assert(b.putIfAbsent(f, "again".getBytes("UTF-8")))
      intercept[java.nio.file.NoSuchFileException] {
        b.read(new File(dir, "_ptr.none"))
      }
    }
  }

  test("phantom-slot withdrawal holds over the wire backend") {
    withWire { b =>
      val dir = Files.createTempDirectory("graft_cas_wp").toFile
      assert(PointerCas.commitIfGen(dir, 0L, "v1", b))
      val stalled = PointerCas.commitIfGen(dir, 1L, "PHANTOM", b,
        beforePut = () => {
          var g = PointerCas.gen(dir, b)
          while (g < 1L + PointerCas.Keep + 2L) {
            assert(PointerCas.commitIfGen(dir, g, s"v${g + 1}", b))
            g += 1
          }
        })
      assert(!stalled, "a phantom win must report a lost race on the wire")
      val head = PointerCas.gen(dir, b)
      assert(PointerCas.read(dir, b).get == s"v$head")
      assert(!b.list(dir).contains("_ptr.2"))
    }
  }

  // ---- the SIGNED wire backend: AWS SigV4 over the same matrix,
  // against a signature-ENFORCING stub (re-derives server-side, 403 on
  // any mismatch — the auth gate a real S3/MinIO endpoint runs) ----

  private val SigCreds = ("AKIDEXAMPLE",
    "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")

  private def withSignedWire[A](body: CasBackend => A): A = {
    val srv = new CasStubServer(requireSigV4 = Some(SigCreds))
    val signer = new SigV4.Signer(SigCreds._1, SigCreds._2, "us-east-1")
    try body(new HttpCas(srv.endpoint, signer = Some(signer)))
    finally srv.stop()
  }

  test("SigV4 derivation matches AWS's published worked example") {
    // the complete example from the public SigV4 specification
    // (docs.aws.amazon.com, "Signature Version 4 signing process"):
    // GET https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08
    // at 20150830T123600Z with the documented demo credentials
    val emptySha = SigV4.payloadHash(Array.empty)
    assert(emptySha ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
    val cr = SigV4.canonicalRequest("GET", "/",
      "Action=ListUsers&Version=2010-05-08",
      Seq("host" -> "iam.amazonaws.com",
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "x-amz-date" -> "20150830T123600Z"),
      emptySha)
    val toSign = SigV4.stringToSign("20150830T123600Z",
      "20150830/us-east-1/iam/aws4_request", cr)
    assert(toSign.linesIterator.toSeq(3) ==
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59",
      s"canonical-request hash diverged:\n$cr")
    val sig = SigV4.signature(
      SigV4.signingKey(SigCreds._2, "20150830", "us-east-1", "iam"),
      toSign)
    assert(sig ==
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7",
      "the documented final signature must reproduce")
  }

  test("racing CAS increments serialize on the SIGNED wire backend") {
    withSignedWire(raceIncrements)
  }

  test("the signature-enforcing store rejects unsigned and " +
    "wrong-secret clients; verify() round-trips the Signer") {
    val srv = new CasStubServer(requireSigV4 = Some(SigCreds))
    try {
      val dir = Files.createTempDirectory("graft_cas_sig").toFile
      val f = new File(dir, "_ptr.1")
      // unsigned client: every verb is 403 → surfaced as IOException
      val unsigned = new HttpCas(srv.endpoint)
      intercept[java.io.IOException] {
        unsigned.putIfAbsent(f, "x".getBytes("UTF-8"))
      }
      // wrong secret: same refusal (the signature, not the key id,
      // is what the store checks)
      val badSigner = new SigV4.Signer(SigCreds._1, "WRONG", "us-east-1")
      intercept[java.io.IOException] {
        new HttpCas(srv.endpoint, signer = Some(badSigner))
          .putIfAbsent(f, "x".getBytes("UTF-8"))
      }
      // correctly signed: full round-trip, payload covered by the hash
      val good = new HttpCas(srv.endpoint,
        signer = Some(new SigV4.Signer(SigCreds._1, SigCreds._2,
          "us-east-1")))
      assert(good.putIfAbsent(f, "signed".getBytes("UTF-8")))
      assert(new String(good.read(f), "UTF-8") == "signed")
      assert(good.list(dir).contains("_ptr.1"))
      assert(!good.putIfAbsent(f, "loser".getBytes("UTF-8")),
        "a lost CAS must still surface as 412 through the auth gate")
      good.delete(f)
      assert(!good.list(dir).contains("_ptr.1"))
    } finally srv.stop()
  }

  test("legacy fixed-name fallback reads through the backend") {
    val b = new InMemoryCas
    val dir = Files.createTempDirectory("graft_cas_l").toFile
    assert(PointerCas.readOrLegacy(dir, "_stats", b).isEmpty)
    assert(b.putIfAbsent(new File(dir, "_stats"), "7 9".getBytes("UTF-8")))
    assert(PointerCas.readOrLegacy(dir, "_stats", b).contains("7 9"))
    // the first generation commit supersedes the legacy file
    assert(PointerCas.commitIfGen(dir, 0L, "10 12", b))
    assert(PointerCas.readOrLegacy(dir, "_stats", b).contains("10 12"))
  }
}
