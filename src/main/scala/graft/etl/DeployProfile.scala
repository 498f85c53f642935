package graft.etl

/** The reference's deploy-profile switch (crowdsorsa-etl-2023.R:13-27):
  * the prod pipeline pushes to the live API as source KE.1721 with the
  * standard access token; ANY branch other than `main` flips all three
  * coupled choices at once — test API host, test source id KE.1501,
  * and the dev token env var (the R script overwrites
  * FINBIF_ACCESS_TOKEN from FINBIF_DEV_ACCESS_TOKEN). One config
  * object threads the triple through Enrichment / DocumentAssembly /
  * HttpPushSink so the three can never be mixed — a prod-source
  * document can't be pushed at the test host by construction. */
final case class DeployProfile(
    name: String,
    sourceId: String,
    apiUrl: String,
    tokenEnv: String) {
  def sourceUri: String = s"http://tun.fi/$sourceId"
  /** The warehouse push endpoint at this profile's host. */
  def pushUrl: String = s"${apiUrl}v0/warehouse/push"
  /** Resolve the access token from this profile's env var. The
    * deterministic fallback that keeps zero-egress tests runnable is
    * restricted to the TEST profile — a prod push with
    * FINBIF_ACCESS_TOKEN unset must fail fast (the reference reads the
    * env var directly and a missing token surfaces on the first push),
    * not silently authenticate with a dummy token. */
  def token(env: Map[String, String] = sys.env): String =
    env.get(tokenEnv) match {
      case Some(t) => t
      case None if name == "test" => "SECRET123"
      case None => throw new IllegalStateException(
        s"deploy profile '$name': access token env var $tokenEnv is unset")
    }
}

object DeployProfile {
  val Prod = DeployProfile("prod", "KE.1721",
    "https://api.laji.fi/", "FINBIF_ACCESS_TOKEN")
  val Test = DeployProfile("test", "KE.1501",
    "https://apitest.laji.fi/", "FINBIF_DEV_ACCESS_TOKEN")

  /** 2023.R:19 — `Sys.getenv("BRANCH") != "main"` selects test. */
  def forBranch(branch: String): DeployProfile =
    if (branch == "main") Prod else Test
}
